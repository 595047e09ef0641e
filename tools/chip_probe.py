"""On-chip probe for the fused Pallas codec + device rANS (ad-hoc).

The ONLY scripts that may touch the real TPU are bench.py and this one
(CLAUDE.md).  Subcommands:

  validate   compiled correctness vs the oracle across ALL engines:
             Pallas grid/subband/sb-decode (incl. the hardware-only
             unpadded branch) + the planar-XLA engine, padless ragged
  bench      kernel throughput rows (grid/subband x lossless/medium,
             decode), chained-slope methodology
  engines    interleaved repeat sampling of every complete-encode engine
             (median + spread; the bench.py methodology standalone)
  xlaplanar  planar-XLA engine vs production engines (r5 discovery run)
  planarbatch  planar throughput vs batch size (chunking calibration)
  sbreduce   subband liveness-wrapper + coalesced-emission comparison
  kpairs     slope spread vs K-span (tunnel jitter diagnosis)
  sweep      tile_rows sweep of the lossless grid encode
  rollvar    jnp.roll vs pltpu.roll in the kernel shift helpers
  vpucal     VPU op-rate calibration suite (roofline cross-checks)
  sharded    drive the distributed tier on the chip (both engines)
  rans       device rANS stage MB/s + write_fast vs host-rANS e2e
  ransparts  cost attribution inside the device rANS stage
  tiled      gigapixel encode-tiled --fast e2e on hardware (ikonos)

Usage: python tools/chip_probe.py [validate|bench|...] ...
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
        ((300, 500), 4, QuantizationLevel.MEDIUM, "crossed"),  # ragged h AND w
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
        # Subband-direct decode on COMPILED Mosaic: the production route
        # HGICodec.decode_subbands auto-picks on TPU.  Its last tile's
        # decode-halo block reads past the repacked buffer end on
        # hardware (interpret mode pads instead), so this is the one
        # branch the CPU test matrix cannot reach (ADVICE r4 #1).
        if pred == "crossed" and pc.supported_subbands(levels, h, w, q, pred):
            dsb = pc.decode_subbands_pallas(a1, s1, (h, w), levels, pred)
            ref = pyramid.decode_subbands(a1, s1, (h, w), levels)
            ds_ok = np.array_equal(np.asarray(dsb), np.asarray(ref))
        else:
            ds_ok = True
        # planar-XLA engine (the auto default on TPU): all four surfaces
        from rustyhgi_tpu.ops import planar as pl_eng

        if pl_eng.supported_planar(levels, h, w, q, pred):
            gp2, _ = pl_eng.encode_plane_planar(img, levels, q, pred)
            p_ok = np.array_equal(np.asarray(gp2), grid_o)
            dp2 = pl_eng.decode_plane_planar(grid_o, levels, pred)
            p_ok &= np.array_equal(
                np.asarray(dp2), oracle_decode(grid_o, levels, pred))
            if pred == "crossed":
                a3, s3, _ = pl_eng.encode_subbands_planar(img, levels, q, pred)
                p_ok &= np.array_equal(np.asarray(a1), np.asarray(a3)) and all(
                    np.array_equal(np.asarray(x), np.asarray(y))
                    for qs1, qs2 in zip(s1, s3)
                    for x, y in zip(qs1, qs2)
                )
                dsb3 = pl_eng.decode_subbands_planar(a1, s1, (h, w), levels, pred)
                p_ok &= np.array_equal(
                    np.asarray(dsb3),
                    np.asarray(pyramid.decode_subbands(a1, s1, (h, w), levels)),
                )
        else:
            p_ok = True
        print(f"{h}x{w} l{levels} {preset.name} {pred}: "
              f"grid={'OK' if g_ok else 'FAIL'} decode={'OK' if d_ok else 'FAIL'} "
              f"subband={'OK' if s_ok else 'FAIL'} "
              f"sb-decode={'OK' if ds_ok else 'FAIL'} "
              f"planar={'OK' if p_ok else 'FAIL'}")
        ok &= g_ok and d_ok and s_ok and ds_ok and p_ok
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


def cmd_engines():
    """Interleaved repeat sampling of every complete-encode engine.

    Rounds alternate engines so tunnel drift hits all rows equally; the
    per-round numbers expose run-to-run spread directly (VERDICT r3 #1).
    """
    print("device:", jax.devices()[0])
    x = _batch()
    ql = quantize_fn(QuantizationLevel.LOSSLESS)
    floor = 2 * int(np.prod(x.shape))
    pix = int(np.prod(x.shape))

    def sb_reduce(v, res):
        a, s, _ = res
        acc = jnp.sum(a, dtype=jnp.int32)
        for quads in s:
            for q in quads:
                acc = acc + jnp.sum(q, dtype=jnp.int32)
        return v ^ (acc & 255).astype(jnp.uint8)

    def xla_sb(v):
        return sb_reduce(v, pyramid.encode_subbands(v, L, ql, want_recon=False))

    def xla_grid(v):
        g, r = pyramid.encode_plane(v, L, ql)
        return g ^ r

    from rustyhgi_tpu.ops import planar as pl_eng

    rows = [
        ("xla_subband", xla_sb),
        ("xla_grid", xla_grid),
        ("pallas_grid", lambda v: pc.encode_plane_pallas(
            v, L, ql, "crossed", want_recon=False)[0]),
        ("pallas_subband", lambda v: sb_reduce(
            v, pc.encode_subbands_pallas(v, L, ql, "crossed", want_recon=False))),
        ("planar_grid", lambda v: pl_eng.encode_plane_planar(
            v, L, ql, "crossed", want_recon=False)[0]),
        ("planar_subband", lambda v: sb_reduce(
            v, pl_eng.encode_subbands_planar(v, L, ql, "crossed",
                                             want_recon=False))),
    ]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    samples = {name: [] for name, _ in rows}
    for r in range(rounds):
        for name, step in rows:
            t = device_seconds_per_call(step, x, floor_bytes=floor)
            samples[name].append(pix / t / 1e9)
            print(f"  round {r} {name:16s} {pix / t / 1e9:6.1f} GPix/s", flush=True)
    print()
    for name, vals in samples.items():
        v = np.asarray(vals)
        med = np.median(v)
        print(f"{name:16s} median {med:6.1f}  min {v.min():6.1f}  "
              f"max {v.max():6.1f}  spread {(v.max() - v.min()) / med * 100:5.1f}%")
    return 0


def cmd_xlaplanar():
    """The Pallas kernel's planar dataflow as PLAIN XLA — no pallas_call.

    vpucal v2 measured XLA elementwise int32 at ~3x the Mosaic kernel's
    per-op rate (1.47 vs 0.49 Tops/s on the identical chain), so the
    planar u32-word dataflow (pallas_codec._encode_core — pure jnp,
    already the interpret-mode path) may be FASTER compiled as one XLA
    jit on the whole canvas: no tile halo redundancy, no Mosaic
    scheduling gap.  Compare against both production engines.
    """
    print("device:", jax.devices()[0])
    x = _batch()
    ql = quantize_fn(QuantizationLevel.LOSSLESS)
    floor = 2 * int(np.prod(x.shape))
    pix = int(np.prod(x.shape))
    step = 1 << L
    hp = -(-H // step) * step
    wp = -(-W // step) * step
    wc = wp // 4
    tree = pc._TREES["crossed"]

    def planar(v):
        def one(im):
            padded = jnp.pad(im, ((0, hp - H), (0, wp - W)))
            xw = lax.bitcast_convert_type(
                padded.reshape(hp, wc, 4), pc._U32)
            grid, _ = pc._encode_tile(
                xw, L, None, tree, pc._NO_MASK, hp, False)
            return grid

        return pc._from_words(jax.vmap(one)(v), H, W)

    def pallas_grid(v):
        return pc.encode_plane_pallas(v, L, ql, "crossed",
                                      want_recon=False)[0]

    def xla_grid(v):
        g, r = pyramid.encode_plane(v, L, ql)
        return g ^ r

    # bit-exactness first
    g_p = np.asarray(planar(x))
    g_ref = oracle_encode(np.asarray(x[0]), L, QuantizationLevel.LOSSLESS)
    print("planar bits vs oracle:", "OK" if np.array_equal(g_p[0], g_ref)
          else "FAIL", flush=True)

    rows = [("xla_planar", planar), ("pallas_grid", pallas_grid),
            ("xla_grid", xla_grid)]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    samples = {name: [] for name, _ in rows}
    for r in range(rounds):
        for name, stp in rows:
            t = device_seconds_per_call(stp, x, k_lo=8, k_hi=104,
                                        floor_bytes=floor)
            samples[name].append(pix / t / 1e9)
            print(f"  round {r} {name:12s} {pix / t / 1e9:6.1f} GPix/s",
                  flush=True)
    print()
    for name, vals in samples.items():
        v = np.asarray(vals)
        med = np.median(v)
        print(f"{name:12s} median {med:6.1f}  spread "
              f"{(v.max() - v.min()) / med * 100:5.1f}%")
    return 0


def cmd_planarbatch():
    """Planar-engine throughput vs batch size (chunk calibration sweep).

    Pass ``raw`` as the extra arg to disable the engine's internal
    8-plane chunking and observe the UNCHUNKED batch response — the
    measurement that calibrates planar._BATCH_CHUNK in the first place
    (with chunking active, every b > 8 just measures the chunked fix).
    """
    from rustyhgi_tpu.ops import planar as pl_eng

    print("device:", jax.devices()[0])
    raw = len(sys.argv) > 2 and sys.argv[2] == "raw"
    saved = pl_eng._BATCH_CHUNK
    if raw:
        # _batched reads the module constant at trace time; clearing the
        # jit caches forces a retrace under the override.
        pl_eng._BATCH_CHUNK = 1 << 30
        pl_eng._encode_sub_batch._clear_cache()
        print("(raw mode: internal chunking disabled)")
    ql = quantize_fn(QuantizationLevel.LOSSLESS)
    for b in (2, 4, 8, 16, 32):
        x = jnp.asarray(RNG.integers(0, 256, (b, H, W), np.uint8))
        pix = b * H * W

        def sb(v):
            a, s, _ = pl_eng.encode_subbands_planar(
                v, L, ql, "crossed", want_recon=False)
            acc = jnp.sum(a, dtype=jnp.int32)
            for quads in s:
                for q in quads:
                    acc = acc + jnp.sum(q, dtype=jnp.int32)
            return v ^ (acc & 255).astype(jnp.uint8)

        k_hi = max(40, min(232, (232 * 8) // b))
        t = device_seconds_per_call(sb, x, k_lo=8, k_hi=k_hi,
                                    floor_bytes=2 * pix)
        print(f"batch {b:3d}: {pix / t / 1e9:6.1f} GPix/s "
              f"({t * 1e6:8.1f} us/call)", flush=True)
    if raw:
        pl_eng._BATCH_CHUNK = saved
        pl_eng._encode_sub_batch._clear_cache()
    return 0


def cmd_sbreduce():
    """Is the subband row's spread/tie the KERNEL or the liveness wrapper?

    The engines row keeps all 13 subband outputs live by summing each
    into the carry (DCE-proofing).  For the PALLAS engine that is
    overkill: pallas_call is a single opaque primitive, so consuming ANY
    element keeps the whole kernel — but the full sums read ~1.2 B/pixel
    back from HBM as separate XLA reductions.  Compare three liveness
    wrappers around the same kernel call:

      fullsum   the engines-row wrapper (r4 artifact: 51.1, spread 35%)
      tap       one scalar element from each output (sound for pallas)
      anchsum   sum of the anchors only (1/256 of the data)
    """
    print("device:", jax.devices()[0])
    x = _batch()
    ql = quantize_fn(QuantizationLevel.LOSSLESS)
    floor = 2 * int(np.prod(x.shape))
    pix = int(np.prod(x.shape))

    def full(v):
        a, s, _ = pc.encode_subbands_pallas(v, L, ql, "crossed",
                                            want_recon=False, coalesce=True)
        acc = jnp.sum(a, dtype=jnp.int32)
        for quads in s:
            for q in quads:
                acc = acc + jnp.sum(q, dtype=jnp.int32)
        return v ^ (acc & 255).astype(jnp.uint8)

    def tap(v):
        a, s, _ = pc.encode_subbands_pallas(v, L, ql, "crossed",
                                            want_recon=False, coalesce=True)
        acc = a[0, 0, 0].astype(jnp.int32)
        for quads in s:
            for q in quads:
                acc = acc + q[0, 0, 0].astype(jnp.int32)
        return v ^ (acc & 255).astype(jnp.uint8)

    def tap_nocoal(v):
        a, s, _ = pc.encode_subbands_pallas(v, L, ql, "crossed",
                                            want_recon=False, coalesce=False)
        acc = a[0, 0, 0].astype(jnp.int32)
        for quads in s:
            for q in quads:
                acc = acc + q[0, 0, 0].astype(jnp.int32)
        return v ^ (acc & 255).astype(jnp.uint8)

    def full_nocoal(v):
        a, s, _ = pc.encode_subbands_pallas(v, L, ql, "crossed",
                                            want_recon=False, coalesce=False)
        acc = jnp.sum(a, dtype=jnp.int32)
        for quads in s:
            for q in quads:
                acc = acc + jnp.sum(q, dtype=jnp.int32)
        return v ^ (acc & 255).astype(jnp.uint8)

    def grid_ref(v):
        return pc.encode_plane_pallas(v, L, ql, "crossed",
                                      want_recon=False)[0]

    rows = [("fullsum", full), ("tap", tap),
            ("full13", full_nocoal), ("tap13", tap_nocoal),
            ("grid(ref)", grid_ref)]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    samples = {name: [] for name, _ in rows}
    for r in range(rounds):
        for name, step in rows:
            t = device_seconds_per_call(step, x, k_lo=8, k_hi=104,
                                        floor_bytes=floor)
            samples[name].append(pix / t / 1e9)
            print(f"  round {r} {name:10s} {pix / t / 1e9:6.1f} GPix/s",
                  flush=True)
    print()
    for name, vals in samples.items():
        v = np.asarray(vals)
        med = np.median(v)
        print(f"{name:10s} median {med:6.1f}  min {v.min():6.1f}  "
              f"max {v.max():6.1f}  spread {(v.max() - v.min()) / med * 100:5.1f}%")
    return 0


def cmd_kpairs():
    """Spread of the chained-slope measurement vs K-pair span.

    If the 30% round-to-round spread of the fast rows (engines probe)
    shrinks as the K_hi-K_lo span grows, the spread is tunnel RTT jitter
    in the slope, not device-time variance — bench.py then sizes K_hi so
    the span dwarfs the jitter.
    """
    print("device:", jax.devices()[0])
    x = _batch()
    ql = quantize_fn(QuantizationLevel.LOSSLESS)
    floor = 2 * int(np.prod(x.shape))
    pix = int(np.prod(x.shape))

    def sb_reduce(v, res):
        a, s, _ = res
        acc = jnp.sum(a, dtype=jnp.int32)
        for quads in s:
            for q in quads:
                acc = acc + jnp.sum(q, dtype=jnp.int32)
        return v ^ (acc & 255).astype(jnp.uint8)

    def xla_sb(v):
        return sb_reduce(v, pyramid.encode_subbands(v, L, ql, want_recon=False))

    rows = [
        ("pallas_grid", lambda v: pc.encode_plane_pallas(
            v, L, ql, "crossed", want_recon=False)[0]),
        ("xla_subband", xla_sb),
    ]
    for name, step in rows:
        for (klo, khi) in ((8, 40), (8, 104), (8, 232)):
            vals = []
            for r in range(4):
                t = device_seconds_per_call(step, x, k_lo=klo, k_hi=khi,
                                            floor_bytes=floor)
                vals.append(pix / t / 1e9)
            v = np.asarray(vals)
            med = np.median(v)
            print(f"{name:14s} K=({klo},{khi}): " +
                  " ".join(f"{q:6.1f}" for q in vals) +
                  f"  | med {med:6.1f} spread "
                  f"{(v.max() - v.min()) / med * 100:5.1f}%", flush=True)
    return 0


def cmd_rollvar():
    """jnp.roll vs pltpu.roll in the kernel's shift helpers.

    jnp.roll inside a Mosaic kernel may lower to slice+concat (a lane
    relayout) instead of the single hardware rotate pltpu.roll emits;
    the shifts run on every level's lattice so the difference is
    ~per-pixel.
    """
    from jax.experimental.pallas import tpu as pltpu

    print("device:", jax.devices()[0])
    x = _batch()
    ql = quantize_fn(QuantizationLevel.LOSSLESS)
    floor = 2 * int(np.prod(x.shape))

    orig_lane, orig_sub = pc._shift_lane, pc._shift_sub

    def roll_lane(p):
        r = pltpu.roll(p, p.shape[-1] - 1, p.ndim - 1)
        m = pc._cached(
            ("ledge", p.shape),
            lambda: pc._iota(p.shape, p.ndim - 1) < p.shape[-1] - 1,
        )
        return jnp.where(m, r, 0)

    def roll_sub(p):
        r = pltpu.roll(p, p.shape[-2] - 1, p.ndim - 2)
        m = pc._cached(
            ("sedge", p.shape),
            lambda: pc._iota(p.shape, p.ndim - 2) < p.shape[-2] - 1,
        )
        return jnp.where(m, r, 0)

    def run(tag):
        # fresh jit cache per variant (the jitted _encode_batch caches by
        # static args only, so clear it to force a re-trace)
        pc._encode_batch._clear_cache()
        step = lambda v: pc.encode_plane_pallas(
            v, L, ql, "crossed", want_recon=False)[0]
        # correctness spot check
        g = np.asarray(pc.encode_plane_pallas(x[:1], L, ql, "crossed")[0])
        from rustyhgi_tpu.oracle import oracle_encode
        ok = np.array_equal(g[0], oracle_encode(np.asarray(x[0]), L,
                                                QuantizationLevel.LOSSLESS))
        t = device_seconds_per_call(step, x, k_lo=8, k_hi=104,
                                    floor_bytes=floor)
        pix = int(np.prod(x.shape))
        print(f"{tag:16s} {t * 1e6:8.1f} us  {pix / t / 1e9:6.1f} GPix/s  "
              f"bits {'OK' if ok else 'FAIL'}", flush=True)

    run("jnp.roll")
    pc._shift_lane, pc._shift_sub = roll_lane, roll_sub
    try:
        run("pltpu.roll")
    finally:
        pc._shift_lane, pc._shift_sub = orig_lane, orig_sub
        pc._encode_batch._clear_cache()
    return 0


def cmd_sharded():
    """Drive the distributed tier on the real chip (1-device mesh).

    Validates both TPU routes of encode/decode_batch_sharded with
    oracle-exact bytes: the default (planar engine) AND the
    force_pallas route — the compiled-Mosaic-inside-shard_map
    combination whose check_vma=True behavior the _check_vma docstring
    cites this probe for.  Then measures sharded-path throughput vs the
    direct kernel call.
    """
    from rustyhgi_tpu.parallel.mesh import make_mesh
    from rustyhgi_tpu.parallel import sharded

    print("device:", jax.devices()[0])
    mesh = make_mesh((1, 1), jax.devices()[:1])
    q = QuantizationLevel.LOSSLESS
    ql = quantize_fn(q)
    imgs = RNG.integers(0, 256, (N, H, W), np.uint8)
    assert sharded._engine_for(L, H, W, ql, "crossed") == "planar", (
        "sharded tier did not choose the planar engine on TPU"
    )
    g0 = oracle_encode(imgs[0], L, q)
    for force in (False, True):
        label = "pallas" if force else "planar"
        grids, recons, hist = sharded.encode_batch_sharded(
            imgs, L, q, mesh=mesh, with_histogram=True, force_pallas=force
        )
        ok = np.array_equal(np.asarray(grids)[0], g0)
        dec = sharded.decode_batch_sharded(
            np.asarray(grids), L, mesh=mesh, force_pallas=force
        )
        d_ok = np.array_equal(np.asarray(dec), imgs)
        print(f"sharded({label}) bytes vs oracle: {'OK' if ok else 'FAIL'}; "
              f"decode roundtrip: {'OK' if d_ok else 'FAIL'}; "
              f"hist sum {int(np.asarray(hist).sum())} == {imgs.size}")

    x = jnp.asarray(imgs)
    pix = imgs.size

    def direct(v):
        return pc.encode_plane_pallas(v, L, ql, "crossed", want_recon=False)[0]

    t = device_seconds_per_call(direct, x, k_lo=8, k_hi=104,
                                floor_bytes=2 * pix)
    print(f"direct kernel:  {pix / t / 1e9:6.1f} GPix/s")
    t0 = time.perf_counter()
    for _ in range(5):
        g, r, _ = sharded.encode_batch_sharded(imgs, L, q, mesh=mesh)
        np.asarray(g).ravel()[:1]
    t = (time.perf_counter() - t0) / 5
    print(f"sharded e2e (incl. H2D/dispatch): {pix / t / 1e6:6.0f} MPix/s")
    return 0


def cmd_vpucal():
    """VPU op-rate calibration SUITE on the kernel's own data layout.

    Round-4's roofline rested on ONE probe (a 3-op dependent chain on
    the 16 planes, op count UNROLLED into the kernel) measuring 0.44
    int32 Tops/s effective — ~8x below the v5e VPU's nominal
    elementwise rate — with no cross-check (VERDICT r4 #1).  This suite
    varies that probe along every axis that could explain the gap:

      mix3x16      the r4 probe chain: add+shr+xor, 16 independent
                   plane chains (ILP-rich — the codec's own shape)
      add / shift / csel   single-op-class chains: which op class is
                   slow?  The codec mix is ~55%% add, ~25%% shift,
                   ~10%% compare/select, ~10%% bitops.
      f32add       f32 adds: are int32 ALUs the limiter?
      xla          the IDENTICAL mix3 chain as a plain XLA elementwise
                   jit (no Pallas): independent compiler, same machine.

    Probe design (v2): the round count k is a DEVICE OPERAND driving a
    ``lax.fori_loop`` (Mosaic: k arrives via SMEM), so each row is ONE
    compile — the v1 unrolled-chain design needed 4 slow tunnel
    compiles per row and regularly blew the 10-minute window.  Timing
    is direct dispatch at k in {200, 2000}: at 2000 rounds the device
    time (~hundreds of ms) dwarfs the ~25 ms tunnel RTT, and the slope
    between the two k cancels dispatch and the fixed split/pack work.
    Effective rate = 3 * (k_hi - k_lo) * pixels / dt.

    A latency-exposing "dependent" variant (all 16 chains strung
    serially) was considered and dropped: each vector op on a (32, 480)
    plane spans ~15 vregs, so even a serialized chain has 15-way ILP
    inside every op — it cannot isolate issue width.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("device:", jax.devices()[0])
    x = _batch()
    n, h, w = x.shape
    pix = int(np.prod(x.shape))
    K_LO, K_HI = 200, 2000

    # One fori round == 3 ops per pixel for every chain kind.
    def mk_round(kind):
        if kind == "mix3":
            return lambda i, p: ((p + (i + 1)) >> 1) ^ p, jnp.int32
        if kind == "add":
            # three DISTINCT-operand adds (constant-constant folds away)
            return lambda i, p: ((p + (i | 1)) + p) + i, jnp.int32
        if kind == "shift":
            # shr, xor, shr — not algebraically collapsible
            return lambda i, p: ((p >> 1) ^ p) >> 1, jnp.int32
        if kind == "csel":
            return (
                lambda i, p: jnp.where(p > (i | 1), p + 1, p),
                jnp.int32,
            )  # cmp + add + select
        if kind == "f32add":
            # add, mul, add — converges to a finite fixpoint over any k
            return (
                lambda i, p: (p + jnp.float32(1.5)) * jnp.float32(0.5)
                + jnp.float32(0.25),
                jnp.float32,
            )
        raise KeyError(kind)

    def build_mosaic(kind, k_trip):
        # k is a STATIC fori trip count: the loop body is compiled once
        # (cheap) regardless of k, and a dynamic SMEM-fed trip count
        # crashes this toolchain's remote Mosaic compiler (HTTP 500).
        rnd, dt = mk_round(kind)

        @jax.jit
        def run(image):
            hp_t, wp, wc, th, halo, n_tiles = pc._plan(h, w, 4, 1, None)
            xw = lax.bitcast_convert_type(image.reshape(n, h, wc, 4), pc._U32)

            def kernel(main_ref, halo_ref, out_ref):
                t = pl.program_id(1) if n_tiles > 1 else 0
                xx = jnp.concatenate([main_ref[0], halo_ref[0]], axis=0)
                pc._CACHE = {}
                try:
                    D = pc._bytes16_from_u32(xx, h - t * th)
                    planes = [D[ry][rx].astype(dt) for ry in range(4)
                              for rx in range(4)]

                    def body(i, ps):
                        return [rnd(i, p) for p in ps]

                    planes = lax.fori_loop(0, k_trip, body, planes)
                    for ry in range(4):
                        for rx in range(4):
                            D[ry][rx] = planes[4 * ry + rx].astype(
                                pc._PT) & 255
                    out_ref[0] = pc._pack_u32(D, th // 4)
                finally:
                    pc._CACHE = None

            return pl.pallas_call(
                kernel,
                grid=(n, n_tiles),
                in_specs=pc._pair_specs(th, halo, wc),
                out_specs=pc._out_spec(th, wc),
                out_shape=jax.ShapeDtypeStruct((n, hp_t, wc), pc._U32),
            )(xw, xw)

        return run

    def build_xla(kind):
        rnd, dt = mk_round(kind)

        @jax.jit
        def run(image, k):
            xw = lax.bitcast_convert_type(
                image.reshape(n, h, w // 4, 4), pc._U32)
            planes = [
                ((xw >> pc._U32(8 * rx)).astype(pc._PT) & 255).astype(dt)
                for rx in range(4)
            ]

            def body(i, ps):
                return [rnd(i, p) for p in ps]

            outs = lax.fori_loop(0, k, body, planes)
            outs = [o.astype(pc._PT) & 255 for o in outs]
            w32 = (outs[0].astype(pc._U32)
                   | (outs[1].astype(pc._U32) << pc._U32(8))
                   | (outs[2].astype(pc._U32) << pc._U32(16))
                   | (outs[3].astype(pc._U32) << pc._U32(24)))
            return lax.bitcast_convert_type(
                w32[..., None], pc._U8).reshape(n, h, w)

        return run

    def measure(mk_fn, dynamic_k):
        times = {}
        for k in (K_LO, K_HI):
            if dynamic_k:
                f, ka = mk_fn, (jnp.int32(k),)
            else:
                f, ka = mk_fn(k), ()
            np.asarray(f(x, *ka).ravel()[:1])  # warm/compile
            times[k] = min_time(
                lambda: np.asarray(f(x, *ka).ravel()[:1]), iters=3)
        dt_s = times[K_HI] - times[K_LO]
        ops = 3 * (K_HI - K_LO) * pix
        return ops / dt_s, times

    rows = [
        ("mix3x16", lambda k: build_mosaic("mix3", k), False),
        ("add", lambda k: build_mosaic("add", k), False),
        ("shift", lambda k: build_mosaic("shift", k), False),
        ("csel", lambda k: build_mosaic("csel", k), False),
        ("f32add", lambda k: build_mosaic("f32add", k), False),
        ("xla", build_xla("mix3"), True),
    ]
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    for name, mk, dyn in rows:
        if only is not None and name not in only:
            continue
        try:
            rate, times = measure(mk, dyn)
            print(f"{name:10s} {rate / 1e12:6.2f} Tops/s  "
                  f"(k{K_LO} {times[K_LO]*1e3:8.1f} ms, "
                  f"k{K_HI} {times[K_HI]*1e3:8.1f} ms)",
                  flush=True)
        except Exception as e:
            print(f"{name:10s} FAILED: {str(e).splitlines()[0][:90]}",
                  flush=True)
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


def cmd_ransparts():
    """Cost attribution inside the device rANS stage (chained slopes).

    The stage = exact histogram + table normalize + packed lookup +
    lockstep scan + sort compaction; the unroll=8 scan change moved the
    stage only 335 -> 354 MB/s, so the bottleneck is elsewhere.  Times
    each piece on the production 1080p medium-residual input.
    """
    from rustyhgi_tpu.models.codec import HGICodec
    from rustyhgi_tpu.ops import tpurans as tr

    print("device:", jax.devices()[0])
    img = np.asarray(_batch()[0])
    codec = HGICodec(4, "medium")
    flat = codec.encode_plane(img)[0].reshape(-1)
    n = flat.shape[0]
    Lw = tr.lanes_for(n)
    T = -(-n // Lw)
    floor = 2 * n

    def as_syms(v):
        padded = jnp.pad(v, (0, T * Lw - n), constant_values=0)
        return padded.reshape(T, Lw).astype(tr._I32)

    def hist_step(v):
        sym = as_syms(v)
        h = tr._histogram(sym)
        return v ^ (h.sum() & 255).astype(jnp.uint8)

    def norm_lookup_step(v):
        sym = as_syms(v)
        freq = tr._normalize_device(tr._histogram(sym))
        cum = jnp.concatenate([jnp.zeros(1, tr._I32), jnp.cumsum(freq)[:-1]])
        fc = tr._lookup_packed(sym, (freq << 16) | cum)
        return v ^ (fc.sum() & 255).astype(jnp.uint8)

    def full_step(v):
        freq, counts, states, stream = tr.encode_device(v)
        acc = (counts.sum() + states.astype(jnp.int32).sum() + freq.sum()
               + stream.astype(jnp.int32).sum())
        return v ^ (acc & 255).astype(jnp.uint8)

    def global_sort_step(v):
        # The GLOBAL flat sort on same-size data — the form production
        # uses (the cheaper per-lane sort was tried and reverted: it
        # inflates the prefix fetch; see encode_device's docstring).
        sym = as_syms(v)
        key = sym.reshape(-1) * 7 + 1
        _, s = lax.sort_key_val(key, sym.reshape(-1).astype(tr._U16),
                                is_stable=False)
        return v ^ (s.astype(jnp.int32).sum() & 255).astype(jnp.uint8)

    for name, stp in (("histogram", hist_step),
                      ("norm+lookup", norm_lookup_step),
                      ("globalsort(ref)", global_sort_step),
                      ("full stage", full_step)):
        t = device_seconds_per_call(stp, flat, k_lo=4, k_hi=16,
                                    floor_bytes=floor)
        print(f"{name:12s} {t * 1e3:7.2f} ms  {n / t / 1e6:6.0f} MB/s",
              flush=True)
    return 0


def cmd_tiled():
    """Gigapixel tier end-to-end ON HARDWARE: encode-tiled --fast.

    Drives the CLI surface (ikonos, 512x512 tiles, fused device entropy
    per tile) on the real chip, decodes with decode-tiled, and checks
    exact recovery + wall throughput.  The tier's pieces are unit-tested
    on CPU; this is the composed path on the production backend.
    """
    import tempfile
    import os

    from rustyhgi_tpu.cli import main as cli_main
    from rustyhgi_tpu.utils.imageio import load_luma

    print("device:", jax.devices()[0])
    src_img = "/root/reference/res/ikonos-barcelona-spain.jpg"
    plane = load_luma(src_img)
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "ik.thgit")
        back = os.path.join(td, "ik.png")
        t0 = time.perf_counter()
        rc = cli_main([
            "encode-tiled", "-i", src_img, "-o", out, "--tile", "512",
            "-l", "4", "-q", "lossless", "--format", "thgi", "--fast",
        ])
        t_enc = time.perf_counter() - t0
        assert rc == 0, rc
        size = os.path.getsize(out)
        t0 = time.perf_counter()
        rc = cli_main(["decode-tiled", "-i", out, "-o", back])
        t_dec = time.perf_counter() - t0
        assert rc == 0, rc
        dec = load_luma(back)
    ok = np.array_equal(dec, plane)
    mpix = plane.size / 1e6
    print(f"lossless roundtrip: {'OK' if ok else 'FAIL'}; "
          f"{mpix:.1f} MPix; archive {size} B "
          f"({size / plane.size:.3f} B/pix)")
    print(f"encode {t_enc:.1f} s ({mpix / t_enc:.1f} MPix/s wall incl. "
          f"compile+link), decode {t_dec:.1f} s ({mpix / t_dec:.1f} MPix/s)")
    return 0 if ok else 1


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
              "sweep": cmd_sweep, "rans": cmd_rans,
              "engines": cmd_engines, "sbreduce": cmd_sbreduce,
              "kpairs": cmd_kpairs, "rollvar": cmd_rollvar,
              "xlaplanar": cmd_xlaplanar,
              "vpucal": cmd_vpucal, "sharded": cmd_sharded,
              "ransparts": cmd_ransparts,
              "planarbatch": cmd_planarbatch, "tiled": cmd_tiled}[cmd]())
