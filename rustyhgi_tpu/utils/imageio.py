"""Host-side image I/O.

The reference loads images with the ``image`` crate and converts to 8-bit
luma via ``to_luma()`` (reference: src/main.rs:42,74).  We use PIL.  For
inputs that are already 8-bit grayscale (e.g. res/LENA.TIF, mode L) both are
the identity, which is why cross-tool bit-exact comparisons anchor on TIF
inputs (SURVEY.md §6).  For RGB inputs the BT.601 luma weights used by both
libraries may differ by ±1 per pixel in rounding; lossy-mode comparisons are
therefore judged on max-error bound and compressed size, not pixel identity.
"""

from __future__ import annotations

import numpy as np

__all__ = ["load_luma", "save_gray"]


def load_luma(path: str) -> np.ndarray:
    """Load an image file as a uint8 [H, W] luma plane (PIL 'L' mode)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), dtype=np.uint8)


def save_gray(path: str, plane: np.ndarray) -> None:
    """Save a uint8 [H, W] plane as a grayscale image (format by extension)."""
    from PIL import Image

    plane = np.ascontiguousarray(plane, dtype=np.uint8)
    Image.fromarray(plane, mode="L").save(path)
