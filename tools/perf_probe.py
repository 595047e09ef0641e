"""Ad-hoc on-chip perf probes (not part of the test suite).

Breaks the lossy encode into stages to find where device time goes.
Run: python tools/perf_probe.py   (uses the real TPU chip)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import device_seconds_per_call, synthetic  # noqa: E402
from rustyhgi_tpu.ops import pyramid  # noqa: E402
from rustyhgi_tpu.ops.pyramid import (  # noqa: E402
    _interleave4,
    _quad_pyramid,
    cell_prediction,
)
from rustyhgi_tpu.ops.quantizers import QuantizationLevel, quantize_fn  # noqa: E402

W, H, LEVELS, BATCH = 1920, 1080, 4, 8
NPIX = W * H * BATCH

image = synthetic(W, H)
batch = np.broadcast_to(image, (BATCH, H, W)).copy()
dbatch = jax.device_put(jnp.asarray(batch), jax.devices()[0])

quant_m = quantize_fn(QuantizationLevel.MEDIUM)
quant_l = quantize_fn(QuantizationLevel.LOSSLESS)


def reduce_all(anchors, subbands):
    acc = jnp.sum(anchors, dtype=jnp.int32)
    for quads in subbands:
        for q in quads:
            acc = acc + jnp.sum(q, dtype=jnp.int32)
    return acc


def report(name, step, floor=2 * NPIX):
    t = device_seconds_per_call(step, dbatch, floor_bytes=floor)
    print(f"{name:42s} {t * 1e3:7.3f} ms/batch  {NPIX / t / 1e6:9.0f} MPix/s")


# 1. subband encode, medium, no recon output
def enc_sb_medium(x):
    a, s, _ = pyramid.encode_subbands(x, LEVELS, quant_m, want_recon=False)
    return x ^ (reduce_all(a, s) & 255).astype(jnp.uint8)


# 2. subband encode, lossless, no recon output (today's headline)
def enc_sb_lossless(x):
    a, s, _ = pyramid.encode_subbands(x, LEVELS, quant_l, want_recon=False)
    return x ^ (reduce_all(a, s) & 255).astype(jnp.uint8)


# 3. pyramid split alone (all levels)
def split_only(x):
    t, quads, _ = _quad_pyramid(pyramid._pad_canvas(x, LEVELS), LEVELS)
    acc = jnp.sum(t, dtype=jnp.int32)
    for q3 in quads:
        for q in q3:
            acc = acc + jnp.sum(q, dtype=jnp.int32)
    return x ^ (acc & 255).astype(jnp.uint8)


# 4. interleave chain alone (recon carry shape): rebuild from quads
def interleave_only(x):
    t, quads, _ = _quad_pyramid(pyramid._pad_canvas(x, LEVELS), LEVELS)
    for k in range(LEVELS - 1, -1, -1):
        t = _interleave4(t, *quads[k])
    return t[..., : x.shape[-2], : x.shape[-1]]


# 5. prediction tree alone per level (no quantize, no interleave)
def pred_only(x):
    t, quads, _ = _quad_pyramid(pyramid._pad_canvas(x, LEVELS), LEVELS)
    acc = jnp.zeros((), jnp.int32)
    coarse = t
    for level in range(LEVELS):
        pred = cell_prediction(coarse.astype(jnp.int32))
        acc = acc + jnp.sum(pred)
        # feed next level with the true lattice (cheap stand-in for recon)
        coarse = _interleave4(coarse, *quads[LEVELS - level - 1])
    return x ^ (acc & 255).astype(jnp.uint8)


# 6. medium without the overflow fixup (isolates fixup cost)
def enc_sb_medium_nofix(x):
    h, w = x.shape[-2:]
    img = pyramid._pad_canvas(x.astype(jnp.uint8), LEVELS)
    coarse, quads, _ = _quad_pyramid(img, LEVELS)
    acc = jnp.sum(coarse, dtype=jnp.int32)
    for level in range(LEVELS):
        pred = cell_prediction(coarse.astype(jnp.int32))
        recon_q, grid_q = [], []
        for t in quads[LEVELS - level - 1]:
            diff = (t.astype(jnp.int32) - pred) & 255
            q = quant_m(diff)
            r = (pred + q) & 255
            recon_q.append(r.astype(jnp.uint8))
            grid_q.append(q.astype(jnp.uint8))
        for g in grid_q:
            acc = acc + jnp.sum(g, dtype=jnp.int32)
        if level < LEVELS - 1:
            coarse = _interleave4(coarse, *recon_q)
    return x ^ (acc & 255).astype(jnp.uint8)


# 7. medium with hand multiply-shift division (no int div)
def quant_mulshift(diff):
    # x // 41 for x in [0, 285+20]: floor(x*51151/2^21) is exact on [0,1023]
    return (((diff + 20) * 51151) >> 21) * 41 & 255


def enc_sb_medium_mulshift(x):
    h, w = x.shape[-2:]
    img = pyramid._pad_canvas(x.astype(jnp.uint8), LEVELS)
    coarse, quads, _ = _quad_pyramid(img, LEVELS)
    acc = jnp.sum(coarse, dtype=jnp.int32)
    for level in range(LEVELS):
        pred = cell_prediction(coarse.astype(jnp.int32))
        recon_q, grid_q = [], []
        for t in quads[LEVELS - level - 1]:
            diff = (t.astype(jnp.int32) - pred) & 255
            q = quant_mulshift(diff)
            fix = ((pred + q) > 255) != ((pred + diff) > 255)
            q = jnp.where(fix, diff, q)
            r = (pred + q) & 255
            recon_q.append(r.astype(jnp.uint8))
            grid_q.append(q.astype(jnp.uint8))
        for g in grid_q:
            acc = acc + jnp.sum(g, dtype=jnp.int32)
        if level < LEVELS - 1:
            coarse = _interleave4(coarse, *recon_q)
    return x ^ (acc & 255).astype(jnp.uint8)


# 8. grid-path medium (what bench.py reports as encode_medium today)
def enc_grid_medium(x):
    g, r = pyramid.encode_plane(x, LEVELS, quant_m)
    return g ^ r


# sanity: mulshift table == reference table
d = np.arange(256)
ref_q = (((d + 20) // 41) * 41) & 255
ms_q = (((d + 20) * 51151) >> 21) * 41 & 255
assert np.array_equal(ref_q, ms_q), "mulshift mismatch"

print(f"device: {jax.devices()[0]}")
report("1 subband medium (no recon out)", enc_sb_medium)
report("2 subband lossless (headline)", enc_sb_lossless)
report("3 pyramid split only", split_only)
report("4 split + interleave chain", interleave_only)
report("5 split + pred + interleave", pred_only)
report("6 medium w/o overflow fixup", enc_sb_medium_nofix)
report("7 medium with mulshift div", enc_sb_medium_mulshift)
report("8 grid medium (bench metric)", enc_grid_medium, floor=3 * NPIX)
