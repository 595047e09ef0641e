"""Benchmark suite mirroring the reference's criterion benches.

One entry per reference bench (reference: benches/bench.rs:33-159), same
synthetic 1920x1080 ``pixel = (x*y) as u8`` image and levels=4
(bench.rs:15-31), same throughput convention (criterion's bytes/s equals
pixels/s there; reported as MPix/s):

| bench                  | reference (bench.rs) | here                         |
|------------------------|----------------------|------------------------------|
| memory                 | :38-52 memcpy ceiling| device plane copy            |
| left_top_nop_encode    | :54-63               | LeftTop predictor, identity q|
| left_top_quanted_encode| :65-74               | LeftTop, Lossless LUT        |
| crossed_nop_encode     | :76-85               | Crossed, identity q          |
| crossed_quanted_encode | :87-96               | Crossed, Lossless LUT        |
| decode                 | :98-110              | Crossed decode               |
| serialization          | :112-127             | host container+entropy stage |
| compression            | :129-151             | e2e encode + serialize       |

Note: in this framework the NoOp quantizer and the Lossless LUT compile to
the same identity kernel (the quantizer's static error bound specializes
the trace), so the *_nop and *_quanted pairs isolate strategy dispatch
cost, not math cost, exactly as in the reference where they isolate
traversal from LUT lookups.

Device timings use the chained-dispatch slope methodology (see bench.py):
the TPU tunnel's ~25 ms dispatch RTT would otherwise swamp the kernels.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import numpy as np

__all__ = ["run_suite", "SUITE"]

W, H, LEVELS = 1920, 1080, 4  # bench.rs:34-36


def _synthetic() -> np.ndarray:
    x = np.arange(W, dtype=np.int64)
    y = np.arange(H, dtype=np.int64)
    return ((y[:, None] * x[None, :]) & 0xFF).astype(np.uint8)


def _median(fn: Callable[[], None], iters: int) -> float:
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _device_step_seconds(step, x, k_lo=2, k_hi=14, iters=3) -> float:
    import jax
    import jax.numpy as jnp
    from jax import lax

    def chained(k):
        @jax.jit
        def f(v):
            return lax.fori_loop(0, k, lambda i, y: step(y ^ jnp.uint8(i & 1)), v)

        return f

    times = {}
    for k in (k_lo, k_hi):
        f = chained(k)
        np.asarray(f(x).ravel()[:1])  # compile + warm
        times[k] = _median(lambda: np.asarray(f(x).ravel()[:1]), iters)
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo)


def run_suite(device: bool = True, batch: int = 8) -> Dict[str, float]:
    """Run the full suite; returns {bench: MPix/s} (serialization/
    compression measured on one plane, device benches on a batch)."""
    import jax
    import jax.numpy as jnp

    from ..models.codec import HGICodec
    from ..ops import pyramid
    from ..ops.predictors import predictor_fn
    from ..ops.quantizers import QuantizationLevel, quantize_fn
    from ..utils.container import Archive, write_hgi

    image = _synthetic()
    planes = jnp.asarray(np.broadcast_to(image, (batch, H, W)).copy())
    npix = batch * W * H
    results: Dict[str, float] = {}

    # memory: device plane copy ceiling (bench.rs:38-52 is host memcpy).
    t = _device_step_seconds(lambda v: v + jnp.uint8(1), planes)
    results["memory"] = npix / t / 1e6

    lossless = quantize_fn(QuantizationLevel.LOSSLESS)
    combos = {
        "left_top_nop_encode": ("left_top", lossless),
        "left_top_quanted_encode": ("left_top", lossless),
        "crossed_nop_encode": ("crossed", lossless),
        "crossed_quanted_encode": ("crossed", lossless),
    }
    for name, (pred_name, quant) in combos.items():
        pred = predictor_fn(pred_name)

        def step(v, quant=quant, pred=pred):
            g, r = pyramid.encode_plane(v, LEVELS, quant, pred)
            return g ^ r

        t = _device_step_seconds(step, planes)
        results[name] = npix / t / 1e6

    t = _device_step_seconds(
        lambda v: pyramid.decode_plane(v, LEVELS), planes
    )
    results["decode"] = npix / t / 1e6

    # serialization: host container+entropy stage on one encoded plane.
    codec = HGICodec(LEVELS, QuantizationLevel.LOSSLESS)
    archive = codec.encode(image)
    t = _median(lambda: write_hgi(archive), iters=3)
    results["serialization"] = W * H / t / 1e6

    # compression: end-to-end encode + serialize of one plane (bench.rs:129).
    def e2e():
        write_hgi(codec.encode(image))

    e2e()
    t = _median(e2e, iters=3)
    results["compression"] = W * H / t / 1e6
    return results


def format_suite(results: Dict[str, float]) -> str:
    width = max(len(k) for k in results)
    return "\n".join(
        f"{k:<{width}}  {v:12,.1f} MPix/s" for k, v in results.items()
    )
