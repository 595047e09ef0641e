"""Planar-dataflow codec compiled as PLAIN XLA — the fastest engine.

The fused Pallas kernel (ops.pallas_codec) exists because the original
XLA engine (ops.pyramid) is dominated by dyadic lane relayouts.  Its
planar u32-word dataflow — extract 16 stride-4 byte planes with
elementwise shifts, run the whole pyramid on them, pack back — removes
those relayouts, and it is PURE jnp (the same code runs interpreted on
CPU).  Round-5 calibration (tools/chip_probe.py vpucal v2) measured
plain XLA executing the identical int32 op chain at ~3x Mosaic's
per-op rate (1.47 vs 0.49 Tops/s: XLA's fusion keeps elementwise chains
register-resident where Mosaic round-trips VMEM), so this module runs
that same dataflow as ONE whole-canvas XLA jit instead of a pallas_call:

* no tile halos — zero redundant compute (the kernel recomputes
  2^L..2^(L+1) rows per tile);
* no Mosaic scheduling gap — ~84-87 GPix/s subband / ~77-79 grid
  medians vs the Pallas kernel's ~53-54 across r5 runs on the 1080p x8
  lossless headline (exact per-run numbers: BENCH_DETAILS.json),
  bit-exact vs the oracle;
* no width cap (the kernel's _MAX_WIDTH guards VMEM; XLA tiles HBM
  itself).

The Pallas kernel remains for configurations where explicit VMEM
control wins and as the measured-engine alternative; both are
bit-identical to rustyhgi_tpu.oracle, so engine choice is pure policy
(models.codec routes by measured speed: planar first).

Reference semantics: src/encoder.rs:39-71, src/decoder.rs:18-46 — same
contract as the other engines; see SURVEY.md §3.5-3.6.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..dyadic import cdiv, effective_levels
from . import pallas_codec as pk
from .quantizers import LinearQuantizer

__all__ = [
    "supported_planar",
    "encode_plane_planar",
    "encode_subbands_planar",
    "decode_plane_planar",
    "decode_subbands_planar",
]


def supported_planar(levels: int, h: int, w: int, quantize, predictor) -> bool:
    """Coverage gate: the kernel's, minus the VMEM-driven width cap."""
    lv = effective_levels(levels, h, w)
    if lv < 2:
        return False
    if predictor not in pk._TREES:
        return False
    if quantize is None:
        return True
    from .quantizers import NoOpQuantizer

    if isinstance(quantize, (LinearQuantizer, NoOpQuantizer)):
        return True
    return bool(getattr(quantize, "identity", False))


# Batch planes processed per fused chunk.  Measured on v5e
# (chip_probe planarbatch, 1080p subband lossless): 84.8 GPix/s at
# batch 8, collapsing to 33.3 at 16 and 27.4 at 32 — beyond ~8 planes
# XLA spills the fused planar working set to HBM.  Larger batches run
# as sequential 8-plane chunks inside the same jit (lax.map), keeping
# peak throughput and one dispatch.
_BATCH_CHUNK = 8


def _batched(one, *args, n):
    """vmap ``one`` over <= _BATCH_CHUNK planes; chunk-serial above.

    Full chunks run under ``lax.map``; a partial remainder runs as its
    own smaller vmap and is concatenated — padding it to a full chunk
    would waste up to chunk-1 planes of full pyramid compute per call.
    """
    c = _BATCH_CHUNK
    if n <= c:
        return jax.vmap(one)(*args)
    nfull = n // c
    rem = n - nfull * c

    head = jax.tree.map(
        lambda x: x[: nfull * c].reshape(nfull, c, *x.shape[1:]),
        tuple(args),
    )
    out = lax.map(lambda a: jax.vmap(one)(*a), head)
    out = jax.tree.map(
        lambda x: x.reshape(nfull * c, *x.shape[2:]), out
    )
    if rem == 0:
        return out
    tail = jax.tree.map(lambda x: x[nfull * c:], tuple(args))
    out_tail = jax.vmap(one)(*tail)
    return jax.tree.map(
        lambda a, b: jnp.concatenate([a, b]), out, out_tail
    )


def _canvas_words(image, hp, wp):
    """uint8 [H, W] -> zero-padded u32-word canvas [hp, wp//4]."""
    h, w = image.shape
    padded = jnp.pad(image, ((0, hp - h), (0, wp - w)))
    return lax.bitcast_convert_type(
        padded.reshape(hp, wp // 4, 4), pk._U32
    )


def _maskf(h, w, hp, wp, lossless):
    if lossless:
        return pk._NO_MASK
    return pk._Masks(h, w, hp, wp, 0)


@partial(
    jax.jit, static_argnames=("levels", "error", "predictor", "want_recon")
)
def _encode_batch(image, levels, error, predictor, want_recon):
    n, h, w = image.shape
    levels = effective_levels(levels, h, w)
    quantize = None if error is None else LinearQuantizer(error)
    lossless = quantize is None
    step = 1 << levels
    hp, wp = cdiv(h, step) * step, cdiv(w, step) * step
    tree = pk._TREES[predictor]
    emit_recon = want_recon and not lossless

    def one(im):
        xw = _canvas_words(im, hp, wp)
        grid, recon = pk._encode_tile(
            xw, levels, quantize, tree, _maskf(h, w, hp, wp, lossless),
            hp, emit_recon,
        )
        return grid, (grid if recon is None else recon)

    gw, rw = _batched(one, image, n=n)
    grid = pk._from_words(gw, h, w)
    if not want_recon:
        return grid, None
    return grid, (image if lossless else pk._from_words(rw, h, w))


@partial(
    jax.jit, static_argnames=("levels", "error", "predictor", "want_recon")
)
def _encode_sub_batch(image, levels, error, predictor, want_recon):
    n, h, w = image.shape
    levels = effective_levels(levels, h, w)
    quantize = None if error is None else LinearQuantizer(error)
    lossless = quantize is None
    step = 1 << levels
    hp, wp = cdiv(h, step) * step, cdiv(w, step) * step
    tree = pk._TREES[predictor]
    emit_recon = want_recon and not lossless
    layout = pk._sub_layout(levels, wp)

    def one(im):
        xw = _canvas_words(im, hp, wp)
        outs, recon = pk._encode_sub_tile(
            xw, levels, quantize, tree, _maskf(h, w, hp, wp, lossless),
            hp, emit_recon,
        )
        return outs, (outs[0] if recon is None else recon)

    outs, rw = _batched(one, image, n=n)

    def to_bytes(x, kind):
        if kind == "vals":
            return x.astype(pk._U8)
        u8 = lax.bitcast_convert_type(x[..., None], pk._U8)
        return u8.reshape(*x.shape[:-1], 2 * x.shape[-1])

    anchors = to_bytes(outs[0], "vals")
    subbands = []
    i = 1
    for kind, scale, width in layout:
        subbands.append(tuple(to_bytes(outs[i + j], kind) for j in range(3)))
        i += 3
    if not want_recon:
        return anchors, subbands, None
    if lossless:
        return anchors, subbands, image
    return anchors, subbands, pk._from_words(rw, h, w)


@partial(jax.jit, static_argnames=("levels", "predictor"))
def _decode_batch(grid, levels, predictor):
    n, h, w = grid.shape
    levels = effective_levels(levels, h, w)
    step = 1 << levels
    hp, wp = cdiv(h, step) * step, cdiv(w, step) * step
    tree = pk._TREES[predictor]

    def one(g):
        gw = _canvas_words(g, hp, wp)
        return pk._decode_tile(
            gw, levels, tree, pk._Masks(h, w, hp, wp, 0), hp
        )

    return pk._from_words(_batched(one, grid, n=n), h, w)


@partial(jax.jit, static_argnames=("levels", "predictor", "h", "w"))
def _decode_sub_batch(anchors, flat_quads, levels, predictor, h, w):
    step = 1 << levels
    hp, wp = cdiv(h, step) * step, cdiv(w, step) * step
    tree = pk._TREES[predictor]
    layout = pk._sub_layout(levels, wp)

    def one(anc, quads):
        entries = []
        i = 0
        for kind, scale, width in layout:
            qs = []
            for j in range(3):
                q = quads[i + j]
                if kind == "pairs":
                    m, k2 = q.shape
                    q = lax.bitcast_convert_type(
                        q.reshape(m, k2 // 2, 2), jnp.uint16
                    )
                qs.append(q.astype(pk._PT))
            entries.append((kind, tuple(qs)))
            i += 3
        gp = pk._unsub_gp(anc.astype(pk._PT), entries, levels)
        gw = pk._pack_u32(gp, hp // 4)
        return pk._decode_tile(
            gw, levels, tree, pk._Masks(h, w, hp, wp, 0), hp
        )

    out = _batched(one, anchors, list(flat_quads), n=anchors.shape[0])
    return pk._from_words(out, h, w)


# -- public wrappers (mirror the pallas_codec surface) ----------------------


def encode_plane_planar(
    image: jnp.ndarray,
    levels: int,
    quantize=None,
    predictor: str = "crossed",
    want_recon: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Planar-XLA counterpart of encode_plane_pallas — bit-identical."""
    image = jnp.asarray(image, pk._U8)
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
    q = pk._norm_quantize(quantize)
    grid, recon = _encode_batch(
        image, int(levels), (None if q is None else q.error), predictor,
        want_recon,
    )
    if squeeze:
        grid = grid[0]
        recon = None if recon is None else recon[0]
    return grid, recon


def encode_subbands_planar(
    image: jnp.ndarray,
    levels: int,
    quantize=None,
    predictor: str = "crossed",
    want_recon: bool = True,
):
    """Planar-XLA counterpart of encode_subbands_pallas — bit-identical."""
    image = jnp.asarray(image, pk._U8)
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
    q = pk._norm_quantize(quantize)
    anchors, subbands, recon = _encode_sub_batch(
        image, int(levels), (None if q is None else q.error), predictor,
        want_recon,
    )
    if squeeze:
        anchors = anchors[0]
        subbands = [tuple(x[0] for x in quads) for quads in subbands]
        recon = None if recon is None else recon[0]
    return anchors, subbands, recon


def decode_plane_planar(
    grid: jnp.ndarray, levels: int, predictor: str = "crossed"
) -> jnp.ndarray:
    """Planar-XLA counterpart of decode_plane_pallas — bit-identical."""
    grid = jnp.asarray(grid, pk._U8)
    squeeze = grid.ndim == 2
    if squeeze:
        grid = grid[None]
    out = _decode_batch(grid, int(levels), predictor)
    return out[0] if squeeze else out


def decode_subbands_planar(
    anchors, subbands, shape, levels: int, predictor: str = "crossed"
) -> jnp.ndarray:
    """Planar-XLA counterpart of decode_subbands_pallas — bit-identical."""
    anchors = jnp.asarray(anchors, pk._U8)
    squeeze = anchors.ndim == 2
    if squeeze:
        anchors = anchors[None]
        subbands = [tuple(q[None] for q in quads) for quads in subbands]
    flat = tuple(jnp.asarray(q, pk._U8) for quads in subbands for q in quads)
    h, w = shape
    out = _decode_sub_batch(
        anchors, flat, effective_levels(int(levels), h, w), predictor, h, w
    )
    return out[0] if squeeze else out
