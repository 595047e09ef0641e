"""SPMD batched/tiled encode over a device mesh.

Replaces the reference's single-threaded drive loop (there is none to port —
SURVEY.md §2) with ``shard_map`` data parallelism: a [B, H, W] batch of
image planes is sharded over the (data, tile) mesh, every device runs the
dense lattice-pyramid kernel on its local shard, and (opt-in) a ``psum``
over the mesh produces the global residual-byte histogram that
parameterizes shared rANS entropy tables (BASELINE.json: "broadcasting
shared quantization tables and coder models").  Compressed blocks are
gathered on host in deterministic batch order.

Tiling (the gigapixel axis): ``tile_plane``/``untile_plane`` split an
arbitrarily large plane into fixed-size tiles that are *independent* HGI
streams — no halo exchange, matching the multi-host plan of SURVEY.md §5.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import pyramid
from ..ops.quantizers import QuantizationLevel, quantize_fn
from .mesh import DATA_AXIS, TILE_AXIS, make_mesh

__all__ = [
    "encode_batch_sharded",
    "decode_batch_sharded",
    "encode_subbands_batch_sharded",
    "decode_subbands_batch_sharded",
    "tile_plane",
    "untile_plane",
    "sharded_histogram",
]


def _batch_pspec() -> P:
    # Batch axis split over both mesh axes; H, W replicated (unsharded).
    return P((DATA_AXIS, TILE_AXIS))


def _mesh_key(mesh: Mesh):
    return (
        mesh.axis_names,
        tuple(mesh.shape.values()),
        tuple(d.id for d in mesh.devices.flat),
    )


# Compiled shard_map executables, keyed by (kind, mesh, shape, params).
# Rebuilding jit(shard_map(...)) per call would re-trace and re-compile
# every time (~seconds); cached calls are pure dispatch.  Bounded FIFO so
# services cycling through many distinct batch shapes cannot grow it
# without limit (compiled executables are MBs each).
_SHARD_CACHE = {}
_SHARD_CACHE_MAX = 64


def _cache_put(key, fn):
    if len(_SHARD_CACHE) >= _SHARD_CACHE_MAX:
        _SHARD_CACHE.pop(next(iter(_SHARD_CACHE)))
    _SHARD_CACHE[key] = fn
    return fn


def _check_override(engine, supported, levels, h, w, quant, predictor):
    """Validate an explicit engine override — raise, never fall back."""
    ok = engine == "xla" or supported(levels, h, w, quant, predictor)
    if not ok:
        raise ValueError(
            f"engine={engine!r} does not cover levels={levels}, "
            f"shape=({h}, {w}), quantizer={quant!r}, "
            f"predictor={predictor!r}"
        )
    return engine


def _engine_for(levels, h, w, quant, predictor, force_pallas=False,
                engine="auto") -> str:
    """Per-shard engine: "planar" | "pallas" | "xla" (HGICodec policy).

    All engines are oracle-bit-exact, so mesh-shape byte-invariance is
    engine-independent.  The planar-XLA engine (ops.planar — fastest
    measured, chip_probe xlaplanar) is plain XLA, so it runs COMPILED
    on every backend and composes with shard_map with no vma caveats —
    the CPU test mesh therefore exercises the production engine
    directly.  The fused Pallas kernel remains reachable on TPU meshes
    via HGICodec parity and with ``force_pallas=True`` (tests run it in
    interpret mode over the virtual mesh — VERDICT r4 #3).

    ``engine`` != "auto" is an explicit user override (CLI --engine):
    it validates coverage and raises rather than silently falling back.
    """
    from ..ops import pallas_codec, planar

    if engine != "auto":
        supported = (
            planar.supported_planar if engine == "planar"
            else pallas_codec.supported
        )
        return _check_override(
            engine, supported, levels, h, w, quant, predictor
        )
    if force_pallas and pallas_codec.supported(levels, h, w, quant, predictor):
        return "pallas"
    if not force_pallas and planar.supported_planar(
        levels, h, w, quant, predictor
    ):
        return "planar"
    if (
        not force_pallas
        and jax.default_backend() == "tpu"
        and pallas_codec.supported(levels, h, w, quant, predictor)
    ):
        return "pallas"
    return "xla"


def _check_vma(use_pallas: bool) -> bool:
    """shard_map's varying-mesh-axes checker setting for this body.

    The r4 build disabled the checker wholesale around the Pallas engine
    because pallas_call emitted un-annotated out_shapes.  The kernels now
    annotate every out_shape with the input's vma
    (ops.pallas_codec._vma), so the checker stays ON — including on the
    production TPU route (ADVICE r4 #3; validated on hardware by
    ``chip_probe.py sharded``).  The one remaining exception is
    INTERPRET-mode pallas (CPU tests forcing the kernel onto a virtual
    mesh): jax's pallas HLO interpreter builds internal dynamic_slice
    indices without vma and trips the checker from inside
    (jax 0.9.0 hlo_interpreter.py:466) — not reachable in production.
    """
    from ..ops.pallas_codec import _interpret

    return not (use_pallas and _interpret())


def encode_batch_sharded(
    images,
    levels: int,
    quantization: QuantizationLevel,
    mesh: Optional[Mesh] = None,
    with_histogram: bool = False,
    predictor: str = "crossed",
    force_pallas: bool = False,
    engine: str = "auto",
):
    """Encode a [B, H, W] uint8 batch sharded over the mesh.

    Returns ``(grids, recons, histogram)`` where grids/recons are sharded
    [B, H, W] uint8 arrays (batch order preserved — the gather back to host
    is deterministic because the sharding itself is an ordered partition of
    the batch axis).  With ``with_histogram=True``, ``histogram`` is the
    replicated int32[256] count of residual bytes across the *global*
    batch (psum over both mesh axes), the input for shared entropy-coder
    tables (``rans_encode(..., freqs=normalized_freqs(hist))``); it costs
    a device scatter-add per call, so it is opt-in and ``histogram`` is
    None when not requested.  int32 counts bound
    one call at < 2**31 residual bytes (~2 gigapixels); chunk larger
    batches across calls.

    B must be divisible by the mesh size; callers pad with zero planes and
    drop them after (see :func:`tile_plane` which returns the pad count).
    """
    if mesh is None:
        mesh = make_mesh()
    if with_histogram and int(np.prod(images.shape)) >= 1 << 31:
        # Checked before any device transfer/materialization.
        raise ValueError(
            "histogram counts are int32: chunk batches below 2**31 pixels"
        )
    images = jnp.asarray(images, jnp.uint8)
    spec = _batch_pspec()
    quant = quantize_fn(quantization)
    h, w = images.shape[-2:]
    # Resolve the engine BEFORE the cache key: "auto" and an explicit
    # override resolving to the same engine share one executable.
    engine = _engine_for(
        levels, h, w, quant, predictor, force_pallas=force_pallas,
        engine=engine,
    )
    key = (
        "enc", _mesh_key(mesh), images.shape,
        levels, int(quantization), with_histogram, predictor, engine,
    )
    fn = _SHARD_CACHE.get(key)
    if fn is None:
        from ..ops.predictors import predictor_fn

        pred = predictor_fn(predictor)

        def local_encode(imgs):
            if engine == "planar":
                from ..ops import planar

                grids, recons = planar.encode_plane_planar(
                    imgs, levels, quant, predictor
                )
            elif engine == "pallas":
                from ..ops import pallas_codec

                grids, recons = pallas_codec.encode_plane_pallas(
                    imgs, levels, quant, predictor
                )
            else:
                grids, recons = jax.vmap(
                    lambda im: pyramid.encode_plane(im, levels, quant, pred)
                )(imgs)
            if with_histogram:
                # Device-side residual histogram; summed over the whole
                # mesh so every device sees the same coder table input.
                hist = jnp.zeros((256,), jnp.int32).at[grids.reshape(-1)].add(1)
                hist = jax.lax.psum(hist, (DATA_AXIS, TILE_AXIS))
            else:
                hist = jnp.zeros((256,), jnp.int32)
            return grids, recons, hist

        fn = jax.jit(
            jax.shard_map(
                local_encode,
                mesh=mesh,
                in_specs=(spec,),
                out_specs=(spec, spec, P()),
                check_vma=_check_vma(engine == "pallas"),
            )
        )
        _cache_put(key, fn)
    images = jax.device_put(images, NamedSharding(mesh, spec))
    grids, recons, hist = fn(images)
    # None (not a zeros array) when the histogram was not requested, so a
    # caller that forgot with_histogram=True fails loudly instead of
    # silently building a degenerate coder table.
    return grids, recons, (hist if with_histogram else None)


def decode_batch_sharded(
    grids,
    levels: int,
    mesh: Optional[Mesh] = None,
    predictor: str = "crossed",
    force_pallas: bool = False,
    engine: str = "auto",
):
    """Decode a [B, H, W] uint8 residual-grid batch sharded over the mesh."""
    if mesh is None:
        mesh = make_mesh()
    grids = jnp.asarray(grids, jnp.uint8)
    spec = _batch_pspec()
    h, w = grids.shape[-2:]
    engine = _engine_for(
        levels, h, w, None, predictor, force_pallas=force_pallas,
        engine=engine,
    )
    key = ("dec", _mesh_key(mesh), grids.shape, levels, predictor, engine)
    fn = _SHARD_CACHE.get(key)
    if fn is None:
        from ..ops.predictors import predictor_fn

        pred = predictor_fn(predictor)

        def local_decode(gs):
            if engine == "planar":
                from ..ops import planar

                return planar.decode_plane_planar(gs, levels, predictor)
            if engine == "pallas":
                from ..ops import pallas_codec

                return pallas_codec.decode_plane_pallas(gs, levels, predictor)
            return jax.vmap(
                lambda g: pyramid.decode_plane(g, levels, pred)
            )(gs)

        fn = jax.jit(
            jax.shard_map(
                local_decode, mesh=mesh, in_specs=(spec,), out_specs=spec,
                check_vma=_check_vma(engine == "pallas"),
            )
        )
        _cache_put(key, fn)
    grids = jax.device_put(grids, NamedSharding(mesh, spec))
    return fn(grids)


def _sub_engine_for(levels, h, w, quant, predictor, force_pallas=False,
                    engine="auto") -> str:
    """Subband analogue of :func:`_engine_for` (kernel has a VMEM gate)."""
    from ..ops import pallas_codec, planar

    if engine != "auto":
        supported = (
            planar.supported_planar if engine == "planar"
            else pallas_codec.supported_subbands
        )
        return _check_override(
            engine, supported, levels, h, w, quant, predictor
        )
    if force_pallas and pallas_codec.supported_subbands(
        levels, h, w, quant, predictor
    ):
        return "pallas"
    if not force_pallas and planar.supported_planar(
        levels, h, w, quant, predictor
    ):
        return "planar"
    if (
        not force_pallas
        and jax.default_backend() == "tpu"
        and pallas_codec.supported_subbands(levels, h, w, quant, predictor)
    ):
        return "pallas"
    return "xla"


def encode_subbands_batch_sharded(
    images,
    levels: int,
    quantization: QuantizationLevel,
    mesh: Optional[Mesh] = None,
    predictor: str = "crossed",
    force_pallas: bool = False,
    engine: str = "auto",
):
    """Subband-layout encode of a [B, H, W] batch sharded over the mesh.

    Returns ``(anchors, subbands)`` with a leading batch dim on every
    array — the archivable .thgi subband payload, produced without the
    row-major grid interleave (the fastest complete encode, see
    ops.pyramid.encode_subbands).  Like :func:`encode_batch_sharded`,
    bytes are mesh-shape- and engine-invariant.
    """
    if mesh is None:
        mesh = make_mesh()
    images = jnp.asarray(images, jnp.uint8)
    spec = _batch_pspec()
    quant = quantize_fn(quantization)
    h, w = images.shape[-2:]
    engine = _sub_engine_for(
        levels, h, w, quant, predictor, force_pallas=force_pallas,
        engine=engine,
    )
    key = (
        "encsb", _mesh_key(mesh), images.shape,
        levels, int(quantization), predictor, engine,
    )
    fn = _SHARD_CACHE.get(key)
    if fn is None:
        from ..ops.predictors import predictor_fn

        pred = predictor_fn(predictor)

        def local(imgs):
            if engine == "planar":
                from ..ops import planar

                anchors, subbands, _ = planar.encode_subbands_planar(
                    imgs, levels, quant, predictor, want_recon=False
                )
            elif engine == "pallas":
                from ..ops import pallas_codec

                anchors, subbands, _ = pallas_codec.encode_subbands_pallas(
                    imgs, levels, quant, predictor, want_recon=False
                )
            else:
                anchors, subbands, _ = jax.vmap(
                    lambda im: pyramid.encode_subbands(
                        im, levels, quant, pred, want_recon=False
                    )
                )(imgs)
            return anchors, [tuple(q) for q in subbands]

        fn = jax.jit(
            jax.shard_map(
                local, mesh=mesh, in_specs=(spec,), out_specs=spec,
                check_vma=_check_vma(engine == "pallas"),
            )
        )
        _cache_put(key, fn)
    images = jax.device_put(images, NamedSharding(mesh, spec))
    return fn(images)


def decode_subbands_batch_sharded(
    anchors,
    subbands,
    shape: Tuple[int, int],
    levels: int,
    mesh: Optional[Mesh] = None,
    predictor: str = "crossed",
    force_pallas: bool = False,
    engine: str = "auto",
):
    """Subband-direct decode of a sharded batch: -> [B, H, W] planes.

    Engine per :func:`_sub_engine_for`: the planar-XLA subband-direct
    decode on every backend; the Pallas repack+decode path only via
    ``force_pallas=True``; the dyadic XLA path outside both envelopes.
    """
    if mesh is None:
        mesh = make_mesh()
    anchors = jnp.asarray(anchors, jnp.uint8)
    subbands = [tuple(jnp.asarray(q, jnp.uint8) for q in qs) for qs in subbands]
    spec = _batch_pspec()
    h, w = tuple(shape)[-2:]
    engine = _sub_engine_for(
        levels, h, w, None, predictor, force_pallas=force_pallas,
        engine=engine,
    )
    key = (
        "decsb", _mesh_key(mesh), anchors.shape, tuple(shape),
        levels, predictor, engine,
    )
    fn = _SHARD_CACHE.get(key)
    if fn is None:
        from ..ops.predictors import predictor_fn

        pred = predictor_fn(predictor)

        def local(a, s):
            if engine == "planar":
                from ..ops import planar

                return planar.decode_subbands_planar(
                    a, s, (h, w), levels, predictor
                )
            if engine == "pallas":
                from ..ops import pallas_codec

                return pallas_codec.decode_subbands_pallas(
                    a, s, (h, w), levels, predictor
                )
            return jax.vmap(
                lambda a1, s1: pyramid.decode_subbands(
                    a1, s1, (h, w), levels, pred
                )
            )(a, s)

        fn = jax.jit(
            jax.shard_map(
                local, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
                check_vma=_check_vma(engine == "pallas"),
            )
        )
        _cache_put(key, fn)
    put = lambda x: jax.device_put(x, NamedSharding(mesh, spec))
    anchors = put(anchors)
    subbands = jax.tree.map(put, subbands)
    return fn(anchors, subbands)


def sharded_histogram(grids, mesh: Optional[Mesh] = None) -> jax.Array:
    """Replicated int32[256] histogram of a sharded uint8 batch."""
    if mesh is None:
        mesh = make_mesh()
    grids = jnp.asarray(grids, jnp.uint8)
    key = ("hist", _mesh_key(mesh), grids.shape)
    fn = _SHARD_CACHE.get(key)
    if fn is None:

        def local(gs):
            h = jnp.zeros((256,), jnp.int32).at[gs.reshape(-1)].add(1)
            return jax.lax.psum(h, (DATA_AXIS, TILE_AXIS))

        fn = jax.jit(
            jax.shard_map(
                local, mesh=mesh, in_specs=(_batch_pspec(),), out_specs=P()
            )
        )
        _cache_put(key, fn)
    return fn(grids)


# --------------------------------------------------------------------------
# Spatial tiling: gigapixel planes -> independent fixed-size tile streams.
# --------------------------------------------------------------------------


def tile_plane(
    plane: np.ndarray, tile: Tuple[int, int]
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Split an [H, W] plane into [nT, th, tw] zero-padded tiles.

    Tiles are row-major over the tile grid — the deterministic stream order
    for gather/reassembly.  Returns (tiles, (H, W)) so ``untile_plane`` can
    crop the padding back off.
    """
    th, tw = tile
    h, w = plane.shape
    nh, nw = -(-h // th), -(-w // tw)
    padded = np.zeros((nh * th, nw * tw), dtype=np.uint8)
    padded[:h, :w] = plane
    tiles = (
        padded.reshape(nh, th, nw, tw).transpose(0, 2, 1, 3).reshape(-1, th, tw)
    )
    return np.ascontiguousarray(tiles), (h, w)


def untile_plane(
    tiles: np.ndarray, shape: Tuple[int, int]
) -> np.ndarray:
    """Inverse of :func:`tile_plane`."""
    h, w = shape
    n, th, tw = tiles.shape
    nh, nw = -(-h // th), -(-w // tw)
    if n != nh * nw:
        raise ValueError(f"{n} tiles cannot cover {shape} with {th}x{tw}")
    padded = (
        tiles.reshape(nh, nw, th, tw).transpose(0, 2, 1, 3).reshape(nh * th, nw * tw)
    )
    return np.ascontiguousarray(padded[:h, :w])


def pad_batch(batch: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    """Zero-pad the batch axis to a device-count multiple; returns pad count."""
    b = batch.shape[0]
    target = -(-b // multiple) * multiple
    if target == b:
        return batch, 0
    pad = np.zeros((target - b, *batch.shape[1:]), dtype=batch.dtype)
    return np.concatenate([batch, pad], axis=0), target - b
