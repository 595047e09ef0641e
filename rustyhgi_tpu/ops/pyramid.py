"""TPU-native lattice-pyramid codec core (pure JAX/XLA).

This module re-designs the reference's scalar per-pixel sweep
(reference: src/encoder.rs:39-71, src/decoder.rs:18-46, src/utils.rs:12-41)
as dense lattice arithmetic, exploiting two structural facts proved in
SURVEY.md §3.5:

1. **No intra-level dependency** — a refinement-level pixel reads only the
   4 corners of its enclosing cell, all written at strictly earlier levels,
   so each level is one embarrassingly-parallel pass.
2. **Position-independent prediction** — the Crossed predictor
   (interpolator.rs:57-91) depends only on the cell corners, not on where
   the pixel sits inside the cell.  All three refined pixels of a cell
   share one prediction.

Consequently one pyramid level is, in its entirety:

    coarse lattice C [hc, wc]  (spacing 2s)
      -> zero-pad by one row/col   (OOB corners read 0, interpolator.rs:75-82)
      -> 4 shifted views TL/TR/BL/BR
      -> integer rounding tree     (interpolator.rs:41-55)
      -> 2x2 upsample to the fine lattice [hf, wf]  (spacing s)
      -> mod-256 residual, quantize, overflow fixup (encoder.rs:53-60)
      -> stitch coarse values back at even-even sites

No gathers, no scatters, no scalar loops: pure elementwise VPU work plus
pads/reshapes that XLA fuses.  Total element ops across all levels are
~(4/3)*H*W, matching the reference's O(H*W) single-visit total.  Only the
``levels <= 8`` level passes are sequential; the Python loop over them is
unrolled at trace time (static shapes per level).

All arithmetic runs in int32 (VPU-native); values stay within [0, 1020] so
the integer math is exact, and ``& 255`` reproduces the reference's u8
wrapping semantics (encoder.rs:53,63).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "cell_prediction",
    "encode_plane",
    "decode_plane",
    "reconstruct_encode",
]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def cell_prediction(coarse: jnp.ndarray) -> jnp.ndarray:
    """Crossed prediction for every cell of a coarse lattice.

    ``coarse`` is the int32 [hc, wc] reconstructed lattice at spacing 2s.
    Returns the int32 [hc, wc] prediction shared by the three refined pixels
    of each cell.  Implements the exact integer rounding tree of
    interpolator.rs:41-55 — four round-half-up edge averages, then a
    truncating ``>> 2`` — with out-of-bounds corners reading 0
    (interpolator.rs:75-82) via the zero pad.
    """
    padded = jnp.pad(coarse, ((0, 1), (0, 1)))
    tl = padded[:-1, :-1]
    tr = padded[:-1, 1:]
    bl = padded[1:, :-1]
    br = padded[1:, 1:]
    return (
        ((tl + tr + 1) >> 1)
        + ((bl + br + 1) >> 1)
        + ((tl + bl + 1) >> 1)
        + ((tr + br + 1) >> 1)
    ) >> 2


def _upsample2(a: jnp.ndarray, hf: int, wf: int) -> jnp.ndarray:
    """Nearest 2x upsample then crop to the fine-lattice shape."""
    return jnp.repeat(jnp.repeat(a, 2, axis=0), 2, axis=1)[:hf, :wf]


def _even_even_mask(hf: int, wf: int) -> jnp.ndarray:
    """True at fine-lattice sites that coincide with the coarse lattice."""
    iy = lax.broadcasted_iota(jnp.int32, (hf, wf), 0)
    ix = lax.broadcasted_iota(jnp.int32, (hf, wf), 1)
    return ((iy & 1) == 0) & ((ix & 1) == 0)


def _refine_encode(
    coarse: jnp.ndarray,
    grid_coarse: jnp.ndarray,
    true_fine: jnp.ndarray,
    quantize: Callable[[jnp.ndarray], jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One encode level: coarse lattice -> fine lattice (closed loop).

    Returns (recon_fine, grid_fine).  The reconstructed (not original)
    values are carried to the next level, mirroring the reference's in-loop
    reconstruction (encoder.rs:63-64) so encoder and decoder prediction
    states are identical by construction.
    """
    hf, wf = true_fine.shape
    pred = _upsample2(cell_prediction(coarse), hf, wf)
    diff = (true_fine - pred) & 255
    q = quantize(diff)
    # Overflow fixup (encoder.rs:56-60): if quantization changes whether
    # pred + residual carries past 255, store the raw diff (lossless pixel).
    overflow = (pred + q) > 255
    overflow_expected = (pred + diff) > 255
    q = jnp.where(overflow != overflow_expected, diff, q)
    recon = (pred + q) & 255

    keep = _even_even_mask(hf, wf)
    recon = jnp.where(keep, _upsample2(coarse, hf, wf), recon)
    grid = jnp.where(keep, _upsample2(grid_coarse, hf, wf), q)
    return recon, grid


def encode_plane(
    image: jnp.ndarray,
    levels: int,
    quantize: Callable[[jnp.ndarray], jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode a uint8 [H, W] plane.

    Returns ``(grid, recon)`` — the residual grid (anchors raw at the
    2**levels lattice, quantized residuals elsewhere; encoder.rs:26-37,62)
    and the reconstructed image, both uint8 [H, W].  Returning the
    reconstruction is free (it is the loop carry) and gives callers
    encoder-side distortion metrics without a decode pass.
    """
    h, w = image.shape
    img = image.astype(jnp.int32)
    step = 1 << levels
    coarse = img[::step, ::step]  # anchor lattice, stored raw
    grid = coarse
    for level in range(levels):
        substep = 1 << (levels - level - 1)
        true_fine = img[::substep, ::substep]
        coarse, grid = _refine_encode(coarse, grid, true_fine, quantize)
    return grid.astype(jnp.uint8), coarse.astype(jnp.uint8)


def decode_plane(grid: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Decode a uint8 [H, W] residual grid back to the image (decoder.rs:18-46)."""
    h, w = grid.shape
    g = grid.astype(jnp.int32)
    step = 1 << levels
    coarse = g[::step, ::step]
    for level in range(levels):
        substep = 1 << (levels - level - 1)
        hf, wf = _cdiv(h, substep), _cdiv(w, substep)
        residual = g[::substep, ::substep]
        pred = _upsample2(cell_prediction(coarse), hf, wf)
        recon = (pred + residual) & 255
        keep = _even_even_mask(hf, wf)
        coarse = jnp.where(keep, _upsample2(coarse, hf, wf), recon)
    return coarse.astype(jnp.uint8)


def reconstruct_encode(
    image: jnp.ndarray,
    levels: int,
    quantize: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Encode and return only the residual grid (see :func:`encode_plane`)."""
    return encode_plane(image, levels, quantize)[0]
