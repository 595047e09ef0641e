"""On-chip probe for the fused Pallas codec + device rANS (ad-hoc).

The ONLY scripts that may touch the real TPU are bench.py and this one
(CLAUDE.md).  Subcommands:

  validate   compiled-Mosaic correctness vs the oracle: grid + subband
             emission + the padless ragged-height path
  bench      kernel throughput rows (grid/subband x lossless/medium,
             decode), chained-slope methodology
  sweep      tile_rows sweep of the lossless grid encode
  rans       device rANS stage MB/s + write_fast vs host-rANS e2e

Usage: python tools/chip_probe.py [validate|bench|sweep|rans] ...
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import device_seconds_per_call, min_time  # noqa: E402
from rustyhgi_tpu.oracle import oracle_decode, oracle_encode  # noqa: E402
from rustyhgi_tpu.ops import pallas_codec as pc  # noqa: E402
from rustyhgi_tpu.ops import pyramid  # noqa: E402
from rustyhgi_tpu.ops.quantizers import (  # noqa: E402
    QuantizationLevel,
    quantize_fn,
)

H, W, N, L = 1080, 1920, 8, 4
RNG = np.random.default_rng(1)


def _batch():
    return jnp.asarray(RNG.integers(0, 256, (N, H, W), np.uint8))


def cmd_validate():
    print("device:", jax.devices()[0])
    ok = True
    for (h, w), levels, preset, pred in [
        ((1080, 1920), 4, QuantizationLevel.LOSSLESS, "crossed"),
        ((1080, 1920), 4, QuantizationLevel.MEDIUM, "crossed"),
        ((517, 1024), 3, QuantizationLevel.LOSSLESS, "crossed"),  # padless ragged h
        ((256, 384), 5, QuantizationLevel.HIGH, "left_top"),
    ]:
        img = RNG.integers(0, 256, (h, w), np.uint8)
        q = quantize_fn(preset)
        grid_o = oracle_encode(img, levels, preset, pred)
        grid_p, _ = pc.encode_plane_pallas(img, levels, q, pred)
        g_ok = np.array_equal(np.asarray(grid_p), grid_o)
        dec_p = pc.decode_plane_pallas(grid_o, levels, pred)
        d_ok = np.array_equal(np.asarray(dec_p), oracle_decode(grid_o, levels, pred))
        a1, s1, _ = pyramid.encode_subbands(jnp.asarray(img), levels, q)
        a2, s2, _ = pc.encode_subbands_pallas(img, levels, q, pred) if pred == "crossed" else (a1, s1, None)
        s_ok = np.array_equal(np.asarray(a1), np.asarray(a2)) and all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for qs1, qs2 in zip(s1, s2)
            for x, y in zip(qs1, qs2)
        )
        print(f"{h}x{w} l{levels} {preset.name} {pred}: "
              f"grid={'OK' if g_ok else 'FAIL'} decode={'OK' if d_ok else 'FAIL'} "
              f"subband={'OK' if s_ok else 'FAIL'}")
        ok &= g_ok and d_ok and s_ok
    return 0 if ok else 1


def _bench_row(name, step, x, floor):
    t = device_seconds_per_call(step, x, floor_bytes=floor)
    pix = int(np.prod(x.shape))
    print(f"{name:32s} {t * 1e6:8.1f} us  {pix / t / 1e9:6.1f} GPix/s")


def cmd_bench():
    print("device:", jax.devices()[0])
    x = _batch()
    ql = quantize_fn(QuantizationLevel.LOSSLESS)
    qm = quantize_fn(QuantizationLevel.MEDIUM)
    floor = 2 * int(np.prod(x.shape))

    def sb_reduce(v, res):
        a, s, _ = res
        acc = jnp.sum(a, dtype=jnp.int32)
        for quads in s:
            for q in quads:
                acc = acc + jnp.sum(q, dtype=jnp.int32)
        return v ^ (acc & 255).astype(jnp.uint8)

    _bench_row("grid lossless", lambda v: pc.encode_plane_pallas(
        v, L, ql, "crossed", want_recon=False)[0], x, floor)
    _bench_row("grid medium", lambda v: pc.encode_plane_pallas(
        v, L, qm, "crossed", want_recon=False)[0], x, floor)
    _bench_row("subband lossless", lambda v: sb_reduce(
        v, pc.encode_subbands_pallas(v, L, ql, "crossed", want_recon=False)), x, floor)
    _bench_row("subband medium", lambda v: sb_reduce(
        v, pc.encode_subbands_pallas(v, L, qm, "crossed", want_recon=False)), x, floor)
    _bench_row("decode grid", lambda v: pc.decode_plane_pallas(
        v, L, "crossed"), x, floor)
    return 0


def cmd_sweep():
    print("device:", jax.devices()[0])
    x = _batch()
    ql = quantize_fn(QuantizationLevel.LOSSLESS)
    floor = 2 * int(np.prod(x.shape))
    for tr in (None, 32, 64, 96, 128, 192, 256):
        try:
            _bench_row(f"tile_rows={tr}", lambda v, tr=tr: pc.encode_plane_pallas(
                v, L, ql, "crossed", want_recon=False, tile_rows=tr)[0], x, floor)
        except Exception as e:
            print(f"tile_rows={tr}: {str(e).splitlines()[0][:80]}")
    return 0


def cmd_rans():
    from rustyhgi_tpu.models.codec import HGICodec
    from rustyhgi_tpu.ops import tpurans
    from rustyhgi_tpu.ops.entropy import rans_encode
    from rustyhgi_tpu.utils.container import _rans_mt_encode, read_thgi

    print("device:", jax.devices()[0])
    img = np.asarray(_batch()[0])
    codec = HGICodec(4, "medium")
    grid_dev = codec.encode_plane(img)[0].reshape(-1)

    def step(v):
        freq, counts, states, stream = tpurans.encode_device(v)
        acc = (counts.sum() + states.astype(jnp.int32).sum() + freq.sum()
               + stream.astype(jnp.int32).sum())
        return v ^ (acc & 255).astype(jnp.uint8)

    t = device_seconds_per_call(step, grid_dev, k_lo=4, k_hi=16,
                                floor_bytes=2 * H * W)
    print(f"device rANS stage: {H * W / t / 1e6:.0f} MB/s")

    blob = codec.write_fast(img)
    blob = codec.write_fast(img)  # estimate warm
    host = len(rans_encode(np.asarray(codec.encode_plane(img)[0]).tobytes()))
    print(f"payload {len(blob)} B = {len(blob) / host:.3f}x host rANS")
    assert np.array_equal(
        read_thgi(blob).grid, np.asarray(codec.encode_plane(img)[0])
    )
    t_fast = min_time(lambda: codec.write_fast(img), iters=5)

    def e2e_rans():
        g, _ = codec.encode_plane(img)
        return _rans_mt_encode(np.asarray(g).tobytes())

    e2e_rans()
    t_rans = min_time(e2e_rans, iters=5)
    print(f"write_fast {t_fast * 1e3:6.1f} ms ({W * H / t_fast / 1e6:5.1f} MPix/s)  "
          f"e2e_rans {t_rans * 1e3:6.1f} ms ({W * H / t_rans / 1e6:5.1f} MPix/s)")
    return 0


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "bench"
    sys.exit({"validate": cmd_validate, "bench": cmd_bench,
              "sweep": cmd_sweep, "rans": cmd_rans}[cmd]())
