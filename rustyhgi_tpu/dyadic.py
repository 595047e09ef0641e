"""Shared dyadic-geometry helpers (no jax dependency).

Used by the device kernels (ops.pyramid), the host containers
(utils.container), and the native bindings (ops.native) — all three must
agree exactly on these quantities for encode/decode to interoperate.
"""

from __future__ import annotations

__all__ = ["cdiv", "effective_levels"]


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def effective_levels(levels: int, h: int, w: int) -> int:
    """Clamp the pyramid depth to the depths that actually touch pixels.

    Levels whose fine spacing meets or exceeds both image dims visit no
    pixels (their lattices contain only already-processed coarser points),
    so ``levels`` beyond ``ceil(log2(max(h, w)))`` produce the identical
    grid — but a literal 2**levels canvas would explode (levels=16 on a
    256x256 plane is a 4 GB canvas) and C++ shifts by >= 32 bits are UB.
    Containers still record the caller's nominal scale_level; every
    decoder applies the same clamp.
    """
    cap = (max(h, w) - 1).bit_length()  # ceil(log2(max dim)); 0 for 1x1
    return max(0, min(levels, cap))
