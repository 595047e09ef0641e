"""Pallas TPU kernels: the device-side bit-pack entropy stage.

BASELINE.json's north star calls for "a device-side bit-pack/rANS stage
with a host finalizer": residual planes are entropy-reduced **on the
chip** so the host only frames variable-length blocks instead of crunching
every byte.  rANS itself is state-serial per stream and ill-suited to the
VPU, but bit-plane packing is pure shift/mask/reduce arithmetic — a
perfect Pallas fit:

* residual bytes are zigzag-remapped (mod-256 residuals cluster near 0 and
  255; zigzag folds them to small magnitudes),
* the stream is blocked into 1024-symbol tiles of shape (8, 128),
* each block stores only ``b = bits_needed(max zigzag)`` bit-planes, one
  (1, 128) row per plane, where byte ``out[r, j]`` packs bit ``r`` of the
  8 values in lane ``j``'s sublane column,
* the kernel emits a fixed-capacity (8, 128) output per block plus the
  per-block width; the **host finalizer** is two vectorized NumPy mask
  moves (concatenate kept rows / re-expand), no per-byte host work.

This gives a "fast" container mode whose end-to-end encode cost is device
compute + transfer (~2x size reduction on typical lossy residuals), and
halves the input to the optional host rANS/DEFLATE stage in "small" mode.

Kernels run compiled on TPU and in interpreter mode elsewhere (CPU tests).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "zigzag",
    "unzigzag",
    "pack_blocks",
    "unpack_blocks",
    "finalize_packed",
    "expand_packed",
    "pack_bytes",
    "unpack_bytes",
]

BLOCK = 1024  # symbols per block: an (8, 128) u8 tile
_SUB, _LANE = 8, 128
_CHUNK = 128  # blocks per kernel program (128 KiB of input)


def zigzag(v: jnp.ndarray) -> jnp.ndarray:
    """Fold mod-256 residual bytes to small magnitudes (int32 in/out).

    0, 255, 1, 254, 2, ... -> 0, 1, 2, 3, 4, ...
    """
    small = v < 128
    return jnp.where(small, v * 2, (256 - v) * 2 - 1)


def unzigzag(z: jnp.ndarray) -> jnp.ndarray:
    even = (z & 1) == 0
    return jnp.where(even, z >> 1, (256 - ((z + 1) >> 1)) & 255)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pack_kernel(in_ref, out_ref, width_ref):
    """Pack one chunk of blocks: in [C, 8, 128] u8 -> bitplanes + widths.

    All intermediates stay rank >= 2 — Mosaic's layout inference aborts on
    rank-1 vectors (observed on v5e).
    """
    v = in_ref[:].astype(jnp.int32)
    z = zigzag(v)  # [C, 8, 128]
    c = z.shape[0]
    m = jnp.max(jnp.max(z, axis=1), axis=1, keepdims=True)  # [C, 1]
    # bits needed = number of thresholds 2^r <= m
    width = jnp.zeros((c, 1), jnp.int32)
    for r in range(8):
        width = width + (m >= (1 << r)).astype(jnp.int32)
    width_ref[:] = width

    k = lax.broadcasted_iota(jnp.int32, (c, _SUB, _LANE), 1)  # sublane index
    planes = []
    for r in range(8):
        bits = (z >> r) & 1
        planes.append(jnp.sum(bits << k, axis=1))  # [C, 128]
    out_ref[:] = jnp.stack(planes, axis=1).astype(jnp.uint8)  # [C, 8, 128]


def _unpack_kernel(in_ref, out_ref):
    """Inverse: bitplanes [C, 8, 128] -> symbols [C, 8, 128].

    Absent planes are zero-filled by the host expander, so the full
    8-plane reconstruction is exact regardless of block width.
    """
    p = in_ref[:].astype(jnp.int32)  # [C, 8(planes), 128]
    c = p.shape[0]
    k = lax.broadcasted_iota(jnp.int32, (c, _SUB, _LANE), 1)
    z = jnp.zeros((c, _SUB, _LANE), jnp.int32)
    for r in range(8):
        plane = p[:, r, :][:, None, :]  # [C, 1, 128]
        z = z | (((plane >> k) & 1) << r)
    out_ref[:] = unzigzag(z).astype(jnp.uint8)


def _pad_blocks(flat: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    n = flat.shape[0]
    nb = -(-n // BLOCK)
    nb_pad = -(-nb // _CHUNK) * _CHUNK
    padded = jnp.pad(flat, (0, nb_pad * BLOCK - n))
    return padded.reshape(nb_pad, _SUB, _LANE), nb


def pack_blocks(flat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Device bit-pack of a flat uint8 stream.

    Returns ``(packed [nbp, 8, 128] u8, widths [nbp] i32, nb)`` where only
    the first ``widths[i]`` planes of block i carry data and ``nb`` is the
    real (unpadded) block count.
    """
    blocks, nb = _pad_blocks(flat)
    nbp = blocks.shape[0]
    grid = (nbp // _CHUNK,)
    packed, widths = pl.pallas_call(
        _pack_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_CHUNK, _SUB, _LANE), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=(
            pl.BlockSpec(
                (_CHUNK, _SUB, _LANE), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_CHUNK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nbp, _SUB, _LANE), jnp.uint8),
            jax.ShapeDtypeStruct((nbp, 1), jnp.int32),
        ),
        interpret=_interpret(),
    )(blocks)
    return packed, widths.reshape(-1), nb


def unpack_blocks(expanded: jnp.ndarray) -> jnp.ndarray:
    """Device unpack of host-expanded bitplane blocks -> flat uint8."""
    nbp = expanded.shape[0]
    grid = (nbp // _CHUNK,)
    symbols = pl.pallas_call(
        _unpack_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_CHUNK, _SUB, _LANE), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (_CHUNK, _SUB, _LANE), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nbp, _SUB, _LANE), jnp.uint8),
        interpret=_interpret(),
    )(expanded)
    return symbols.reshape(-1)


# -- host finalizer ---------------------------------------------------------


def finalize_packed(
    packed: np.ndarray, widths: np.ndarray, nb: int, n: int
) -> bytes:
    """Frame the device output: keep only the used planes of each block.

    Layout: u32 LE n, u32 LE nb, nb width nibbles (2 per byte, padded),
    then the concatenated kept planes (128 B per plane).
    """
    packed = np.asarray(packed)[:nb]
    widths = np.asarray(widths)[:nb].astype(np.uint8)
    mask = np.arange(_SUB)[None, :] < widths[:, None]
    body = packed[mask]  # [sum(widths), 128] — one vectorized gather
    nib = widths.copy()
    if nib.size % 2:
        nib = np.append(nib, 0)
    nibbles = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
    return b"".join(
        (
            int(n).to_bytes(4, "little"),
            int(nb).to_bytes(4, "little"),
            nibbles.tobytes(),
            body.tobytes(),
        )
    )


def expand_packed(data: bytes, expected_n: int = None) -> Tuple[np.ndarray, int]:
    """Inverse of :func:`finalize_packed`: re-expand to fixed-capacity
    blocks (zero-filled absent planes), padded to the kernel chunk size.

    ``expected_n`` (when given) is the caller's header-derived stream
    size: the embedded counts must match it exactly, so a hostile body
    cannot declare its own allocation size (bomb guard).

    Returns (expanded [nbp, 8, 128] u8, n).
    """
    if len(data) < 8:
        raise ValueError("truncated bitpack stream")
    n = int.from_bytes(data[0:4], "little")
    nb = int.from_bytes(data[4:8], "little")
    if expected_n is not None and n != expected_n:
        raise ValueError(
            f"bitpack stream size {n} does not match declared {expected_n}"
        )
    if nb != -(-n // BLOCK):
        raise ValueError("bitpack block count does not match stream size")
    nnib = (nb + 1) // 2
    nibbles = np.frombuffer(data, np.uint8, count=nnib, offset=8)
    widths = np.empty(2 * nnib, np.uint8)
    widths[0::2] = nibbles & 0xF
    widths[1::2] = nibbles >> 4
    widths = widths[:nb]
    total_planes = int(widths.sum(dtype=np.int64))
    body = np.frombuffer(
        data, np.uint8, count=total_planes * _LANE, offset=8 + nnib
    ).reshape(total_planes, _LANE)
    nbp = -(-nb // _CHUNK) * _CHUNK
    expanded = np.zeros((nbp, _SUB, _LANE), np.uint8)
    mask = np.arange(_SUB)[None, :] < widths[:, None]
    expanded[:nb][mask] = body
    return expanded, n


def pack_bytes(flat_u8) -> bytes:
    """End-to-end helper: device pack + host finalize of a uint8 stream."""
    flat = jnp.asarray(flat_u8, jnp.uint8).reshape(-1)
    if flat.shape[0] == 0:
        return finalize_packed(
            np.zeros((0, _SUB, _LANE), np.uint8), np.zeros(0, np.int32), 0, 0
        )
    packed, widths, nb = pack_blocks(flat)
    return finalize_packed(
        np.asarray(packed), np.asarray(widths), nb, int(flat.shape[0])
    )


def unpack_bytes(data: bytes, expected_n: int = None) -> np.ndarray:
    """Inverse of :func:`pack_bytes` -> uint8 [n] array."""
    expanded, n = expand_packed(data, expected_n=expected_n)
    if n == 0:
        return np.zeros(0, np.uint8)
    flat = unpack_blocks(jnp.asarray(expanded))
    return np.asarray(flat[:n])
