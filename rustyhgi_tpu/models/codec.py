"""HGICodec — the flagship end-to-end codec model.

The counterpart of the reference's ``Encoder``/``Decoder`` pair
(reference: src/encoder.rs:18-71, src/decoder.rs:14-46), re-packaged the
JAX way: a codec instance is a bundle of jit-compiled, shape-specialized
device functions (compute path) plus host-side container/entropy stages
(rustyhgi_tpu.utils.container).

Device compute routes through three bit-identical engines by speed
policy (see :meth:`HGICodec._engine`): :mod:`rustyhgi_tpu.ops.planar`
(production on TPU), :mod:`rustyhgi_tpu.ops.pallas_codec` (fused
kernel), and :mod:`rustyhgi_tpu.ops.pyramid` (dyadic XLA fallback).
Compiled executables are cached per input shape; first call per shape
pays XLA compile time, subsequent calls are pure device execution.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pyramid
from ..ops.predictors import predictor_fn, predictor_tag
from ..ops.quantizers import QuantizationLevel, linear_error, quantize_fn
from ..utils.container import Archive, Interpolation, Metadata

__all__ = ["HGICodec", "CodecMetrics", "load_exported"]


def load_exported(blob: bytes):
    """Load a serialized codec stage (see :meth:`HGICodec.export_encoder`).

    Returns a callable running the compiled computation without retracing.
    """
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return lambda *args: exported.call(*args)


class CodecMetrics(dict):
    """Metrics produced by :meth:`HGICodec.test` (mirrors main.rs:105-111)."""

    def __str__(self) -> str:  # the reference's printout format
        return (
            f"Uncompressed: {self['uncompressed'] // 1024} kb\n"
            f"Compressed:   {self['compressed'] // 1024} kb\n"
            f"Ratio:        {self['ratio']:.2f}\n"
            f"SD:           {self['sd']:.2f}"
        )


class HGICodec:
    """Hierarchical Grid Interpolation codec, TPU-native.

    Parameters mirror the reference CLI surface (options.rs:53-65):
    ``levels`` is the pyramid depth (--level, default 4) and
    ``quantization`` the quality preset (--quantizator, default medium).
    """

    def __init__(
        self,
        levels: int = 4,
        quantization: QuantizationLevel | str = QuantizationLevel.MEDIUM,
        predictor: str = "crossed",
        quantizer: str = "linear",
        backend: str = "auto",
    ):
        if isinstance(quantization, str):
            quantization = QuantizationLevel.parse(quantization)
        if not 0 <= levels <= 16:
            raise ValueError(f"levels must be in [0, 16], got {levels}")
        if backend not in ("auto", "xla", "pallas", "planar"):
            raise ValueError(
                f"backend must be auto/xla/pallas/planar, got {backend!r}"
            )
        self.levels = int(levels)
        self.quantization = quantization
        self.predictor = predictor
        self.quantizer = quantizer
        self.backend = backend
        quantize_fn(quantization, quantizer)  # validate strategy eagerly
        self._predictor_fn = predictor_fn(predictor)
        self._encode_cache: Dict[Tuple[int, int], jax.stages.Wrapped] = {}
        self._decode_cache: Dict[Tuple[int, int], jax.stages.Wrapped] = {}

    def _engine(self, shape: Tuple[int, int], need_quantize: bool) -> str:
        """Engine choice for this config: "planar" | "pallas" | "xla".

        All engines are bit-identical to the oracle, so this is pure
        speed policy.  ``auto`` on TPU prefers the planar-XLA engine
        (ops.planar — the kernel's planar dataflow as one whole-canvas
        jit; ~84-87 GPix/s subband medians vs the kernel's ~53-54
        across r5 runs, BENCH_DETAILS.json), then the fused Pallas
        kernel, then the dyadic XLA path.  Off-TPU auto keeps the
        dyadic XLA path (CPU fusion favors it); explicit backends
        force.
        """
        quant = self._quantize_fn() if need_quantize else None
        h, w = shape
        if self.backend == "xla":
            return "xla"
        if self.backend in ("planar", "pallas"):
            from ..ops import pallas_codec, planar

            ok = (
                planar.supported_planar(self.levels, h, w, quant, self.predictor)
                if self.backend == "planar"
                else pallas_codec.supported(self.levels, h, w, quant,
                                            self.predictor)
            )
            if not ok:
                raise ValueError(
                    f"backend={self.backend!r} requested but the engine does "
                    f"not cover levels={self.levels}, shape={shape}, "
                    f"quantizer={self.quantizer!r}, "
                    f"predictor={self.predictor!r}"
                )
            return self.backend
        if jax.default_backend() != "tpu":
            return "xla"
        from ..ops import pallas_codec, planar

        if planar.supported_planar(self.levels, h, w, quant, self.predictor):
            return "planar"
        if pallas_codec.supported(self.levels, h, w, quant, self.predictor):
            return "pallas"
        return "xla"

    def _quantize_fn(self):
        return quantize_fn(self.quantization, self.quantizer)

    # -- device compute path ------------------------------------------------

    def _encode_fn(self, shape: Tuple[int, ...]):
        fn = self._encode_cache.get(shape)
        if fn is None:
            levels, quant = self.levels, self._quantize_fn()
            engine = self._engine(shape[-2:], need_quantize=True)
            pred_name = self.predictor
            if engine == "planar":
                from ..ops.planar import encode_plane_planar

                fn = jax.jit(
                    lambda img: encode_plane_planar(
                        img, levels, quant, pred_name
                    )
                )
            elif engine == "pallas":
                from ..ops.pallas_codec import encode_plane_pallas

                fn = jax.jit(
                    lambda img: encode_plane_pallas(
                        img, levels, quant, pred_name
                    )
                )
            else:
                pred = self._predictor_fn
                fn = jax.jit(
                    lambda img: pyramid.encode_plane(img, levels, quant, pred)
                )
            self._encode_cache[shape] = fn
        return fn

    def _decode_fn(self, shape: Tuple[int, ...]):
        fn = self._decode_cache.get(shape)
        if fn is None:
            levels = self.levels
            engine = self._engine(shape[-2:], need_quantize=False)
            pred_name = self.predictor
            if engine == "planar":
                from ..ops.planar import decode_plane_planar

                fn = jax.jit(
                    lambda grid: decode_plane_planar(grid, levels, pred_name)
                )
            elif engine == "pallas":
                from ..ops.pallas_codec import decode_plane_pallas

                fn = jax.jit(
                    lambda grid: decode_plane_pallas(grid, levels, pred_name)
                )
            else:
                pred = self._predictor_fn
                fn = jax.jit(
                    lambda grid: pyramid.decode_plane(grid, levels, pred)
                )
            self._decode_cache[shape] = fn
        return fn

    def encode_plane(self, image) -> Tuple[jax.Array, jax.Array]:
        """uint8 [H, W] (or [B, H, W]) image -> (residual grid, reconstruction).

        Pure device computation.  Batched inputs go straight to the
        backend's native batch entry (never through ``jax.vmap``): the
        fused Pallas kernel runs batch as a grid dimension, and the XLA
        path maps over leading dims natively.
        """
        image = jnp.asarray(image, dtype=jnp.uint8)
        if image.ndim not in (2, 3):
            raise ValueError(f"expected [H, W] or [B, H, W], got {image.shape}")
        return self._encode_fn(image.shape)(image)

    def decode_plane(self, grid) -> jax.Array:
        """uint8 [H, W] (or [B, H, W]) residual grid -> image."""
        grid = jnp.asarray(grid, dtype=jnp.uint8)
        if grid.ndim not in (2, 3):
            raise ValueError(f"expected [H, W] or [B, H, W], got {grid.shape}")
        return self._decode_fn(grid.shape)(grid)

    def encode_subbands(self, image):
        """uint8 [H, W] image -> (anchors, subbands, recon) on device.

        The subband layout is the kernel's natural output (per-level packed
        residual quads) and skips the full-plane grid assembly — the
        fastest complete encode; pair with the .thgi subband container.
        On TPU the fused Pallas kernel emits the subbands directly
        (ops.pallas_codec.encode_subbands_pallas, bit-identical); outside
        its envelope the XLA dyadic path serves.
        """
        image = jnp.asarray(image, dtype=jnp.uint8)
        key = ("sb",) + image.shape
        fn = self._encode_cache.get(key)
        if fn is None:
            from ..ops.pallas_codec import supported_subbands

            levels, quant = self.levels, self._quantize_fn()
            h, w = image.shape[-2:]
            engine = self._engine((h, w), need_quantize=True)
            pred_name = self.predictor
            if engine == "planar":
                from ..ops.planar import encode_subbands_planar

                fn = jax.jit(
                    lambda img: encode_subbands_planar(
                        img, levels, quant, pred_name
                    )
                )
            elif engine == "pallas" and supported_subbands(
                levels, h, w, quant, self.predictor
            ):
                from ..ops.pallas_codec import encode_subbands_pallas

                fn = jax.jit(
                    lambda img: encode_subbands_pallas(
                        img, levels, quant, pred_name
                    )
                )
            else:
                pred = self._predictor_fn
                fn = jax.jit(
                    lambda img: pyramid.encode_subbands(img, levels, quant, pred)
                )
            self._encode_cache[key] = fn
        return fn(image)

    def decode_subbands(self, anchors, subbands, shape):
        """Subband layout -> uint8 [H, W] image on device.

        Under auto on TPU this is the subband-direct Pallas path: a
        no-halo repack kernel (subband quads -> grid words) feeding the
        fused grid decode kernel, both in one jit — bit-identical to the
        XLA decode, which serves outside the kernel envelope.
        """
        key = ("sb", tuple(shape))  # subband shapes derive from shape+levels
        fn = self._decode_cache.get(key)
        if fn is None:
            from ..ops.pallas_codec import supported_subbands

            levels, pred = self.levels, self._predictor_fn
            h, w = tuple(shape)[-2:]
            engine = self._engine((h, w), need_quantize=False)
            pred_name = self.predictor
            if engine == "planar":
                from ..ops.planar import decode_subbands_planar

                fn = jax.jit(
                    lambda a, s: decode_subbands_planar(
                        a, s, shape, levels, pred_name
                    )
                )
            elif engine == "pallas" and supported_subbands(
                levels, h, w, None, self.predictor
            ):
                from ..ops.pallas_codec import decode_subbands_pallas

                fn = jax.jit(
                    lambda a, s: decode_subbands_pallas(
                        a, s, shape, levels, pred_name
                    )
                )
            else:
                fn = jax.jit(
                    lambda a, s: pyramid.decode_subbands(
                        a, s, shape, levels, pred
                    )
                )
            self._decode_cache[key] = fn
        return fn(anchors, subbands)

    def _grid_only_fn(self, shape: Tuple[int, ...]):
        """Residual-grid-only encode (no recon output) for the fast path."""
        levels, quant = self.levels, self._quantize_fn()
        engine = self._engine(shape[-2:], need_quantize=True)
        pred_name = self.predictor
        if engine == "planar":
            from ..ops.planar import encode_plane_planar

            def _grid(img):
                return encode_plane_planar(
                    img, levels, quant, pred_name, want_recon=False
                )[0]
        elif engine == "pallas":
            from ..ops.pallas_codec import encode_plane_pallas

            def _grid(img):
                return encode_plane_pallas(
                    img, levels, quant, pred_name, want_recon=False
                )[0]
        else:
            pred = self._predictor_fn

            def _grid(img):
                return pyramid.reconstruct_encode(img, levels, quant, pred)

        return _grid

    def write_fast(self, image) -> bytes:
        """Fastest encode-to-archive: one fused device program.

        The fused Pallas whole-pyramid encode and the lane-parallel
        device rANS (ops.tpurans) run as a SINGLE jit — the residual
        grid never round-trips to the host, and only entropy-coded bytes
        ever cross the host<->device link.  Counts/states/table ride
        header rows of the same buffer (encode_device_packed) and the
        prefix slice is part of the same program, so on a high-latency
        link the host pays ONE dispatch and ONE transfer sized by a
        cached per-shape estimate of the coded size (an under-estimate —
        first call, or an image far busier than the last — fetches the
        missing tail once).  The host only frames the payload into a
        .thgi (rowmajor layout, rans_tpu codec) — byte-identical to
        ``write_thgi(archive, fast=True)`` on the same backend.
        """
        from ..ops.tpurans import MAX_SYMBOLS

        image = jnp.asarray(image, dtype=jnp.uint8)
        if image.ndim != 2:
            raise ValueError(f"expected [H, W], got {image.shape}")
        h, w = image.shape
        if h * w > MAX_SYMBOLS:
            # Beyond the device coder's exact-histogram envelope
            # (gigapixel planes belong to the tiled path anyway): full
            # writer, host entropy stage.
            from ..utils.container import Archive, write_thgi

            grid, _ = self.encode_plane(image)
            return write_thgi(
                Archive(self.metadata_for(h, w), np.asarray(grid)),
                layouts=("rowmajor",),
            )
        return self.write_fast_batch(image[None])[0]

    def write_fast_batch(self, images) -> list:
        """Batched :meth:`write_fast`: [B, H, W] -> list of .thgi blobs.

        ONE device program encodes and entropy-codes every plane (the
        Pallas kernel runs batch as a grid dimension; the device rANS is
        vmapped over it), and ONE prefix transfer brings back all B
        payload heads.  Each returned blob is byte-identical to
        ``write_fast`` on that plane alone — per-plane frequency tables,
        independent streams — so the batch path composes with the
        serving story without changing the format.
        """
        from ..ops.tpurans import (
            MAX_SYMBOLS,
            encode_device_packed,
            finalize_stream,
            lanes_for,
            meta_rows_for,
            unpack_meta,
        )
        from ..utils.container import (
            _CODEC_RANS_TPU,
            _LAYOUT_ROWMAJOR,
            _thgi_frame,
        )

        images = jnp.asarray(images, dtype=jnp.uint8)
        if images.ndim != 3:
            raise ValueError(f"expected [B, H, W], got {images.shape}")
        b, h, w = images.shape
        if b == 0:
            return []
        n = h * w
        if n > MAX_SYMBOLS:
            return [self.write_fast(images[i]) for i in range(b)]
        L = lanes_for(n)
        meta = meta_rows_for(L)
        T = -(-n // L)
        est = self._encode_cache.get(("fast_rows", h, w), T)
        guess = min(T, -(-est // 32) * 32)
        key = ("fastb", images.shape, guess)
        fn = self._encode_cache.get(key)
        if fn is None:
            _grid = self._grid_only_fn(images.shape)

            def run(imgs):
                grids = _grid(imgs)  # [B, H, W] via the native batch entry
                out = jax.vmap(
                    lambda g: encode_device_packed(g.reshape(-1))
                )(grids)
                return out[:, : meta + guess], out

            fn = jax.jit(run)
            self._encode_cache[key] = fn
        heads, out = fn(images)
        heads_np = np.asarray(heads)  # [B, meta+guess, L] in one transfer
        blobs = []
        max_rows = 0
        for i in range(b):
            freq_np, counts_np, states_np = unpack_meta(heads_np[i, :meta], L)
            rows = min(T, -(-int(counts_np.sum()) // L))
            max_rows = max(max_rows, rows)
            if rows <= guess:
                stream_np = heads_np[i, meta:]
            else:
                kb = min(T, -(-rows // 32) * 32)
                tail = np.asarray(out[i, meta + guess : meta + kb])
                stream_np = np.concatenate([heads_np[i, meta:], tail], axis=0)
            payload = finalize_stream(n, freq_np, counts_np, states_np, stream_np)
            blobs.append(
                _thgi_frame(
                    self.metadata_for(h, w), _LAYOUT_ROWMAJOR, _CODEC_RANS_TPU,
                    n, payload,
                )
            )
        # Estimate update is MONOTONIC after the first measurement: the
        # 32-row guess bucket is baked into the jit key (the prefix slice
        # must live inside the program to stay one-dispatch), so a
        # shrinking estimate would re-bucket and recompile the fused
        # program.  First call (no estimate, guess == T) always
        # re-buckets once; after that the executable count per shape is
        # 2 + (times a larger image than any before arrives), and a
        # sticky-high estimate only costs a slightly larger transfer.
        est_key = ("fast_rows", h, w)
        new_est = max_rows + max(max_rows // 8, 2)
        prev = self._encode_cache.get(est_key)
        if prev is None or prev >= T or new_est > prev:
            self._encode_cache[est_key] = new_est
        return blobs

    def decode_preview(self, anchors, subbands, shape, upto: int):
        """Progressive decode: the 2**(levels-upto)-downsampled preview.

        ``preview[i, j] == full[i * s, j * s]`` exactly (refinement never
        touches coarser-lattice pixels); pair with
        ``utils.container.read_thgi_preview`` so only the archive prefix
        is entropy-decoded.  See ops.pyramid.decode_preview.
        """
        key = ("pv", tuple(shape), int(upto))
        fn = self._decode_cache.get(key)
        if fn is None:
            levels, pred = self.levels, self._predictor_fn
            fn = jax.jit(
                lambda a, s: pyramid.decode_preview(
                    a, s, shape, levels, upto, pred
                )
            )
            self._decode_cache[key] = fn
        return fn(anchors, subbands)

    def compile(self, *shapes: Tuple[int, int]) -> "HGICodec":
        """Ahead-of-time warm-up: compile encode/decode for given shapes.

        Serving deployments call this once at startup so no request pays
        XLA compile time; combined with a persistent compilation cache
        (``jax.config.update("jax_compilation_cache_dir", ...)``) the
        executables also survive process restarts.  Returns self.
        """
        for shape in shapes:
            zero = jnp.zeros(shape, jnp.uint8)
            self._encode_fn(shape).lower(zero).compile()
            self._decode_fn(shape).lower(zero).compile()
        return self

    def export_encoder(self, shape: Tuple[int, int]) -> bytes:
        """Serialize the shape-specialized encoder as a portable artifact.

        Returns jax.export StableHLO bytes: a versioned, retracing-free
        model artifact that any process (same or newer jax) can
        :func:`load_exported` and call — the serving deployment story
        (ship artifacts, not source).
        """
        from jax import export as jexport

        spec = jax.ShapeDtypeStruct(shape, jnp.uint8)
        return bytes(jexport.export(self._encode_fn(shape))(spec).serialize())

    def export_decoder(self, shape: Tuple[int, int]) -> bytes:
        """Serialize the shape-specialized decoder (see export_encoder)."""
        from jax import export as jexport

        spec = jax.ShapeDtypeStruct(shape, jnp.uint8)
        return bytes(jexport.export(self._decode_fn(shape))(spec).serialize())

    # -- archive path (device compute + host entropy/container) -------------

    def metadata_for(self, height: int, width: int) -> Metadata:
        return Metadata(
            quantization_level=self.quantization,
            interpolation=predictor_tag(self.predictor),
            width=width,
            height=height,
            scale_level=self.levels,
        )

    def encode(self, image: np.ndarray) -> Archive:
        """Encode a uint8 [H, W] plane into an :class:`Archive`."""
        image = np.asarray(image, dtype=np.uint8)
        grid, _ = self.encode_plane(image)
        h, w = image.shape
        return Archive(self.metadata_for(h, w), np.asarray(grid))

    def decode(self, archive: Archive) -> np.ndarray:
        """Decode an :class:`Archive` back to a uint8 [H, W] plane.

        Like the reference (main.rs:63-71), decode needs only the grid,
        width/height, and scale_level; the quantizer is encode-side only.
        The archive's interpolation tag is honored — a left_top-encoded
        archive reconstructs with left_top (the reference hardcodes
        Crossed on decode, main.rs:67, which silently garbles its own
        LeftTop archives; this framework decodes by tag).
        """
        from ..ops.predictors import predictor_name_for_tag

        pred = predictor_name_for_tag(archive.metadata.interpolation)
        if archive.metadata.scale_level != self.levels or pred != self.predictor:
            decoder = HGICodec(
                archive.metadata.scale_level,
                self.quantization,
                predictor=pred,
            )
            return np.asarray(decoder.decode_plane(archive.grid))
        return np.asarray(self.decode_plane(archive.grid))

    def test(self, image: np.ndarray, fmt: str = "hgi") -> CodecMetrics:
        """Roundtrip + metrics, mirroring ``hgi test`` (main.rs:73-120).

        Unlike the reference's vacuous check (lib.rs:61 bug, SURVEY.md §4),
        the distortion here is decoded-vs-ORIGINAL.
        """
        from ..utils.container import write_archive

        image = np.asarray(image, dtype=np.uint8)
        grid, recon = self.encode_plane(image)
        archive = Archive(self.metadata_for(*image.shape), np.asarray(grid))
        decoded = np.asarray(recon)  # bit-identical to decode by construction
        blob = write_archive(archive, fmt)

        from ..utils.profiling import codec_metrics

        metrics = codec_metrics(image, decoded, len(blob))
        return CodecMetrics(
            **metrics,
            error_bound=linear_error(self.quantization),
            decoded=decoded,
            archive_bytes=blob,
        )
