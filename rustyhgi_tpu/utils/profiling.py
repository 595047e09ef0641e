"""Tracing, profiling, and structured metrics.

The reference has no observability beyond criterion benches and a
4-line printout (reference: src/main.rs:108-111; SURVEY.md §5).  This
framework's observability tier:

* :func:`trace` — capture a ``jax.profiler`` trace (Perfetto/TensorBoard
  viewable) around any codec region;
* :class:`StageTimer` — wall-clock stage accounting with MPix/s and GB/s
  derivations for pipeline stages (device encode, entropy, container);
* :func:`codec_metrics` — the structured metric set for a roundtrip:
  bytes, ratio, SD (the reference's integer-mean convention), PSNR,
  max abs error, per-stage throughputs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np

__all__ = ["trace", "StageTimer", "codec_metrics", "psnr"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device+host profiler trace into ``log_dir``.

    View with TensorBoard's profile plugin or Perfetto.  Usage::

        with trace("/tmp/hgi-trace"):
            codec.encode_plane(batch)
    """
    import jax

    with jax.profiler.trace(log_dir):
        yield


class StageTimer:
    """Accumulates named stage durations and derives throughputs."""

    def __init__(self) -> None:
        self.seconds: Dict[str, float] = {}
        self.items: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, items: Optional[float] = None):
        """Time a stage; ``items`` is the unit count (pixels, bytes...)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.seconds[name] = self.seconds.get(name, 0.0) + dt
            if items is not None:
                self.items[name] = self.items.get(name, 0.0) + items

    def report(self) -> Dict[str, Dict[str, float]]:
        out: Dict[str, Dict[str, float]] = {}
        for name, sec in self.seconds.items():
            entry = {"seconds": sec}
            if name in self.items and sec > 0:
                entry["items_per_s"] = self.items[name] / sec
            out[name] = entry
        return out

    def __str__(self) -> str:
        lines = []
        for name, e in self.report().items():
            rate = (
                f"  {e['items_per_s'] / 1e6:10.1f} M/s"
                if "items_per_s" in e
                else ""
            )
            lines.append(f"{name:<24} {e['seconds'] * 1e3:9.2f} ms{rate}")
        return "\n".join(lines)


def psnr(original: np.ndarray, decoded: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical planes)."""
    diff = original.astype(np.float64) - decoded.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def codec_metrics(
    original: np.ndarray,
    decoded: np.ndarray,
    compressed_bytes: int,
) -> Dict[str, float]:
    """Structured distortion/size metrics for one roundtrip.

    ``sd`` follows the reference's convention (main.rs:105-111): integer
    mean of squared diffs, then sqrt.
    """
    original = np.asarray(original)
    decoded = np.asarray(decoded)
    diff = original.astype(np.int64) - decoded.astype(np.int64)
    n = original.size
    sd_int = int((diff * diff).sum()) // n if n else 0
    return {
        "uncompressed": n,
        "compressed": compressed_bytes,
        "ratio": n / compressed_bytes if compressed_bytes else float("inf"),
        "sd": float(np.sqrt(sd_int)),
        "psnr_db": psnr(original, decoded),
        "max_error": int(np.abs(diff).max()) if n else 0,
    }
