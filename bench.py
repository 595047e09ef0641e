"""Benchmark harness — run on real TPU hardware.

Prints ONE JSON line with the headline metric: device encode throughput
(MPix/s) on one chip, Lossless, levels=4 (the BASELINE.json headline
config) versus the measured single-thread scalar C++ baseline (the
stand-in for the Rust reference binary — SURVEY.md §6: the Rust toolchain
is absent, so the -O3 C++ twin of the reference's scalar algorithm is the
baseline on this host).

The headline is the best COMPLETE encode to an archivable layout across
the framework's engines — the planar-XLA whole-canvas engine
(ops.planar, the production backend on TPU), the fused Pallas
whole-pyramid kernel (ops.pallas_codec), and the XLA dyadic path
(ops.pyramid) — i.e. bench what ships (reference
benches/bench.rs:33-159).  Every engine's rows go to BENCH_DETAILS.json.

Measurement methodology: the TPU here sits behind a tunnel whose dispatch
round-trip (~25 ms) dwarfs kernel times, and ``block_until_ready`` does
not reliably block until device completion.  All device timings therefore
chain K dependent iterations of the workload inside ONE jitted
``lax.fori_loop`` dispatch, fetch one element to force completion, and
report the slope between two K values — pure steady-state device time,
independent of dispatch latency.  The complete-encode engine candidates
are sampled in interleaved rounds (engine order alternates so tunnel
drift hits every row equally) and recorded as median + min/max spread.

The benchmark image mirrors the reference's criterion setup
(reference: benches/bench.rs:15-31): synthetic 1920x1080 with
pixel = (x*y) as u8, levels=4; criterion's bytes/s equals pixels/s there,
reported here as MPix/s.

Additional metrics (decode, lossy, e2e container, entropy stage, baseline
details) go to stderr and BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synthetic(w: int, h: int) -> np.ndarray:
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    return ((y[:, None] * x[None, :]) & 0xFF).astype(np.uint8)


def median_time(fn, iters: int = 3) -> float:
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def min_time(fn, iters: int = 5) -> float:
    # min is the robust statistic under tunnel/VM contention spikes.
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def device_seconds_per_call(
    step, x, k_lo: int = 8, k_hi: int = 40, floor_bytes: int = 0,
    retries: int = 3,
) -> float:
    """Steady-state device time of ``step`` via chained-iteration slope.

    ``floor_bytes`` is the minimum HBM traffic one call must perform,
    giving a physical plausibility floor at the device's HBM bandwidth.
    A slope below the floor means a contention spike corrupted the K_lo
    sample (it can even go negative); such samples are REJECTED and
    re-measured rather than clamped — clamping would fabricate the best
    possible number exactly when the measurement is worst.  If contention
    persists through every retry, the fallback is the ABSOLUTE time of
    the K_hi chained call divided by K_hi: that still includes one
    dispatch RTT, so it strictly over-states per-call time (reported
    throughput is a lower bound — conservative, never fabricated).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def chained(k):
        @jax.jit
        def f(v):
            return lax.fori_loop(
                0, k, lambda i, y: step(y ^ jnp.uint8(i & 1)), v
            )

        return f

    # Plausibility floor from the attached device's HBM bandwidth (with
    # ~10% headroom) so a contention spike cannot fabricate impossible
    # throughput, without rejecting legitimately faster hardware.
    kind = str(jax.devices()[0]).lower()
    if "v5 lite" in kind or "v5e" in kind:
        bw = 9.0e11
    elif "v6" in kind:
        bw = 1.8e12
    else:
        bw = 3.0e12  # v5p and beyond
    floor = floor_bytes / bw

    fns = {}
    for k in (k_lo, k_hi):
        fns[k] = chained(k)
        np.asarray(fns[k](x).ravel()[:1])  # warm (compile + first run)
    per = None
    for attempt in range(retries):
        times = {
            k: min_time(lambda f=fns[k]: np.asarray(f(x).ravel()[:1]))
            for k in (k_lo, k_hi)
        }
        per = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
        if per >= floor:
            return per
        log(f"WARNING: slope {per * 1e6:.0f}us below HBM floor "
            f"{floor * 1e6:.0f}us for {kind!r} (tunnel contention); "
            f"retry {attempt + 1}/{retries}")
    # Never clamp to the floor (that would fabricate the best possible
    # number under the worst measurement conditions).  Fall back to the
    # dispatch-inclusive absolute time of the K_hi call: a strict
    # over-estimate of per-call time, i.e. an honest lower bound on
    # throughput.
    t_abs = min_time(lambda: np.asarray(fns[k_hi](x).ravel()[:1])) / k_hi
    log(f"WARNING: contention persisted; reporting dispatch-inclusive "
        f"upper-bound time {t_abs * 1e6:.0f}us/call (throughput is a "
        f"lower bound)")
    return t_abs


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from rustyhgi_tpu.ops import pyramid
    from rustyhgi_tpu.ops.quantizers import QuantizationLevel, quantize_fn

    # BATCH=8 is the measured throughput sweet spot on v5e (smaller working
    # set; larger batches see inverse scaling from HBM-resident temps).
    W, H, LEVELS, BATCH = 1920, 1080, 4, 8
    image = synthetic(W, H)
    batch = np.broadcast_to(image, (BATCH, H, W)).copy()
    npix_batch = BATCH * W * H

    dev = jax.devices()[0]
    log(f"device: {dev} | image {W}x{H} x{BATCH} levels={LEVELS}")
    dbatch = jax.device_put(jnp.asarray(batch), dev)

    quant = quantize_fn(QuantizationLevel.LOSSLESS)
    quant_m_early = quantize_fn(QuantizationLevel.MEDIUM)

    def _sb_reduce(x, res):
        # EVERY output (anchors + all residual quads of all levels) is
        # reduced into the carry: any output left unused lets XLA
        # dead-code-eliminate its predictor/residual math and inflate the
        # metric (verified against compiled HLO).  The sums cost ~1 extra
        # pass over ~H*W bytes — an under-reporting bias, never over.
        anchors, subbands, _ = res
        acc = jnp.sum(anchors, dtype=jnp.int32)
        for level_quads in subbands:
            for q in level_quads:
                acc = acc + jnp.sum(q, dtype=jnp.int32)
        return x ^ (acc & 255).astype(jnp.uint8)

    def enc_step(x):
        # Subband encode: a complete encode to the archivable .thgi
        # subband payload, skipping the row-major grid assembly that
        # exists only for .hgi byte interop.
        return _sb_reduce(x, pyramid.encode_subbands(
            x, LEVELS, quant, want_recon=False
        ))

    def enc_grid_step(x):
        g, r = pyramid.encode_plane(x, LEVELS, quant)
        return g ^ r  # keep both outputs live

    def dec_step(x):
        return pyramid.decode_plane(x, LEVELS)

    # -- engine candidates: interleaved repeat sampling (VERDICT r3 #1) -----
    # Every complete-encode engine is measured ENGINE_ROUNDS times with
    # the rounds interleaved (engine order alternates), so tunnel drift
    # hits all rows equally; the recorded median + min/max spread replace
    # the single-sample rows that made r01-r03 artifacts irreproducible.
    # The Pallas kernel always computes every residual internally
    # (nothing for XLA to dead-code-eliminate); want_recon=False only
    # skips the second output write — honest complete-encode numbers.
    from rustyhgi_tpu.ops import pallas_codec, planar

    def enc_pl_step(x):
        return pallas_codec.encode_plane_pallas(
            x, LEVELS, quant, "crossed", want_recon=False
        )[0]

    def enc_pl_sb_step(x):
        return _sb_reduce(x, pallas_codec.encode_subbands_pallas(
            x, LEVELS, quant, "crossed", want_recon=False))

    def enc_planar_step(x):
        return planar.encode_plane_planar(
            x, LEVELS, quant, "crossed", want_recon=False
        )[0]

    def enc_planar_sb_step(x):
        return _sb_reduce(x, planar.encode_subbands_planar(
            x, LEVELS, quant, "crossed", want_recon=False))

    # 7 interleaved rounds (r4 ran 5 and recorded 20.5% headline spread;
    # rounds are ~1 s of slope time each, so more rounds are the cheap
    # way to a tighter median — VERDICT r4 #2).
    ENGINE_ROUNDS = 7
    engine_rows = [
        ("xla_subband", enc_step, 2),
        ("xla_grid", enc_grid_step, 3),
        ("pallas_grid", enc_pl_step, 2),
        ("pallas_subband", enc_pl_sb_step, 2),
        ("planar_grid", enc_planar_step, 2),
        ("planar_subband", enc_planar_sb_step, 2),
    ]
    engine_samples = {name: [] for name, _, _ in engine_rows}
    # K span 8..232: at the planar engine's ~190 us/call the old 96-iter
    # span put only ~18 ms between the two timed points, so the tunnel's
    # +-2-3 ms RTT jitter alone produced ~15% slope spread (the r5
    # planar rows measured 19-34% while pallas at 300 us/call sat at
    # 6-9%).  224 iters puts ~45 ms in the span.
    for rnd in range(ENGINE_ROUNDS):
        for name, step, floor_mult in engine_rows:
            try:
                t = device_seconds_per_call(
                    step, dbatch, k_lo=8, k_hi=232,
                    floor_bytes=floor_mult * npix_batch,
                )
                engine_samples[name].append(npix_batch / t / 1e6)
                log(f"  round {rnd} {name:16s} "
                    f"{npix_batch / t / 1e6:8.0f} MPix/s")
            except Exception as e:
                log(f"  round {rnd} {name} failed: {e}")
    engines = {}
    for name, vals in engine_samples.items():
        if not vals:
            continue
        v = np.asarray(vals)
        med = float(np.median(v))
        engines[name] = {
            "median_mpix_s": med,
            "min_mpix_s": float(v.min()),
            "max_mpix_s": float(v.max()),
            "spread_pct": float((v.max() - v.min()) / med * 100.0),
            "samples": [round(float(s), 1) for s in vals],
        }
        log(f"{name:16s} median {med:8.0f}  spread "
            f"{engines[name]['spread_pct']:5.1f}%")

    enc_mpixps = engines.get("xla_subband", {}).get("median_mpix_s", 0.0)
    enc_grid_mpixps = engines.get("xla_grid", {}).get("median_mpix_s", 0.0)

    # -- decode + lossy rows: same interleaved-median treatment -------------
    # (a single noisy slope once recorded a 6x-too-fast decode row; the
    # median of interleaved rounds rejects such flukes structurally)
    pallas_rows = {}
    for name, vals in (
        ("encode_grid_lossless_mpix_s", engine_samples.get("pallas_grid")),
        ("encode_subband_lossless_mpix_s",
         engine_samples.get("pallas_subband")),
    ):
        if vals:
            pallas_rows[name] = float(np.median(np.asarray(vals)))

    def dec_pl_step(x):
        return pallas_codec.decode_plane_pallas(x, LEVELS, "crossed")

    def dec_planar_step(x):
        return planar.decode_plane_planar(x, LEVELS, "crossed")

    def enc_pl_m_step(x):
        return pallas_codec.encode_plane_pallas(
            x, LEVELS, quant_m_early, "crossed", want_recon=False
        )[0]

    def enc_pl_sb_m_step(x):
        return _sb_reduce(x, pallas_codec.encode_subbands_pallas(
            x, LEVELS, quant_m_early, "crossed", want_recon=False))

    def enc_planar_m_step(x):
        return planar.encode_plane_planar(
            x, LEVELS, quant_m_early, "crossed", want_recon=False
        )[0]

    def enc_step_m(x):
        g, r = pyramid.encode_plane(x, LEVELS, quant_m_early)
        return g ^ r

    aux_rows = [
        ("xla_decode_grid", dec_step, 2),
        ("pallas_decode_grid", dec_pl_step, 2),
        ("planar_decode_grid", dec_planar_step, 2),
        ("pallas_encode_grid_medium", enc_pl_m_step, 2),
        ("pallas_encode_subband_medium", enc_pl_sb_m_step, 2),
        ("planar_encode_grid_medium", enc_planar_m_step, 2),
        ("xla_encode_grid_medium", enc_step_m, 3),
    ]
    aux_samples = {name: [] for name, _, _ in aux_rows}
    for rnd in range(ENGINE_ROUNDS):
        for name, step, floor_mult in aux_rows:
            try:
                t = device_seconds_per_call(
                    step, dbatch, k_lo=8, k_hi=232,
                    floor_bytes=floor_mult * npix_batch,
                )
                aux_samples[name].append(npix_batch / t / 1e6)
            except Exception as e:
                log(f"  round {rnd} {name} failed: {e}")

    def _aux_median(name):
        vals = aux_samples.get(name) or []
        return float(np.median(np.asarray(vals))) if vals else 0.0

    dec_mpixps = _aux_median("xla_decode_grid")
    log(f"decode (grid): {dec_mpixps:.0f} MPix/s (median)")
    pallas_rows["decode_grid_mpix_s"] = _aux_median("pallas_decode_grid")
    pallas_rows["encode_grid_medium_mpix_s"] = _aux_median(
        "pallas_encode_grid_medium")
    pallas_rows["encode_subband_medium_mpix_s"] = _aux_median(
        "pallas_encode_subband_medium")
    planar_rows = {
        "decode_grid_mpix_s": _aux_median("planar_decode_grid"),
        "encode_grid_medium_mpix_s": _aux_median("planar_encode_grid_medium"),
    }
    log(f"pallas decode (grid): {pallas_rows['decode_grid_mpix_s']:.0f} "
        f"MPix/s; encode medium {pallas_rows['encode_grid_medium_mpix_s']:.0f}"
        f"; subband medium {pallas_rows['encode_subband_medium_mpix_s']:.0f}")
    log(f"planar decode (grid): {planar_rows['decode_grid_mpix_s']:.0f} "
        f"MPix/s; encode medium "
        f"{planar_rows['encode_grid_medium_mpix_s']:.0f}")

    # Subband-direct decode (the .thgi subband archive path): no grid
    # split — the quads feed the per-level reconstruct directly.  Both
    # engines (XLA and the repack+grid-decode Pallas path), interleaved
    # medians like everything else.
    from jax import lax as _lax

    enc_sb = jax.jit(lambda x: pyramid.encode_subbands(x, LEVELS, quant))
    anchors, subbands, _ = enc_sb(dbatch)

    def _chained_sb(body, k):
        @jax.jit
        def f(a, s):
            def it(i, carry):
                r = body(carry, s)
                return carry ^ r[..., : carry.shape[-2], : carry.shape[-1]]

            return _lax.fori_loop(0, k, it, a)

        return f

    def _sb_slope(body):
        times = {}
        for k in (8, 232):
            f = _chained_sb(body, k)
            np.asarray(f(anchors, subbands).ravel()[:1])
            times[k] = min_time(
                lambda: np.asarray(f(anchors, subbands).ravel()[:1])
            )
        return (times[232] - times[8]) / 224

    sb_dec_rows = {
        "xla": lambda a, s: pyramid.decode_subbands(a, s, (H, W), LEVELS),
        "pallas": lambda a, s: pallas_codec.decode_subbands_pallas(
            a, s, (H, W), LEVELS, "crossed"
        ),
        "planar": lambda a, s: planar.decode_subbands_planar(
            a, s, (H, W), LEVELS, "crossed"
        ),
    }
    sb_dec_samples = {name: [] for name in sb_dec_rows}
    for _ in range(ENGINE_ROUNDS):
        for name, body in sb_dec_rows.items():
            try:
                t = _sb_slope(body)
                sb_dec_samples[name].append(npix_batch / t / 1e6)
            except Exception as e:
                log(f"subband decode ({name}) failed: {e}")
    dec_sb_mpixps = float(np.median(np.asarray(
        sb_dec_samples["xla"] or [0.0]
    )))
    if sb_dec_samples.get("pallas"):
        pallas_rows["decode_subband_mpix_s"] = float(np.median(np.asarray(
            sb_dec_samples["pallas"]
        )))
    if sb_dec_samples.get("planar"):
        planar_rows["decode_subband_mpix_s"] = float(np.median(np.asarray(
            sb_dec_samples["planar"]
        )))
    log(f"decode (subband): xla {dec_sb_mpixps:.0f}, pallas "
        f"{pallas_rows.get('decode_subband_mpix_s', 0):.0f}, planar "
        f"{planar_rows.get('decode_subband_mpix_s', 0):.0f} MPix/s (medians)")

    enc_m_mpixps = _aux_median("xla_encode_grid_medium")
    log(f"encode medium: {enc_m_mpixps:.0f} MPix/s (median)")

    # scalar C++ baseline (reference stand-in), single plane, single thread
    base = {}
    try:
        from rustyhgi_tpu.ops.native import available, native_decode, native_encode

        if available():
            t = median_time(
                lambda: native_encode(image, LEVELS, QuantizationLevel.LOSSLESS),
                iters=5,
            )
            base["encode_mpix_s"] = W * H / t / 1e6
            grid_np = native_encode(image, LEVELS, QuantizationLevel.LOSSLESS)
            t = median_time(lambda: native_decode(grid_np, LEVELS), iters=5)
            base["decode_mpix_s"] = W * H / t / 1e6
            log(f"scalar C++ baseline: encode {base['encode_mpix_s']:.0f} "
                f"MPix/s decode {base['decode_mpix_s']:.0f} MPix/s")
    except Exception as e:
        log(f"native baseline unavailable: {e}")

    # entropy stage + container sizes on LENA (reference parity check)
    sizes = {}
    entropy_speed = {}
    try:
        from rustyhgi_tpu.models.codec import HGICodec
        from rustyhgi_tpu.utils.container import write_hgi, write_thgi
        from rustyhgi_tpu.utils.imageio import load_luma

        lena = load_luma("/root/reference/res/LENA.TIF")
        for quant_name in ("lossless", "medium"):
            codec = HGICodec(4, quant_name)
            archive = codec.encode(lena)
            sizes[quant_name] = {
                "hgi": len(write_hgi(archive)),
                "thgi": len(write_thgi(archive)),
            }
        from rustyhgi_tpu.ops.entropy import rans_encode
        from rustyhgi_tpu.utils.container import _rans_mt_encode

        codec_m = HGICodec(4, "medium")
        grid_big = np.asarray(codec_m.encode_plane(batch)[0]).tobytes()
        t = median_time(lambda: rans_encode(grid_big), iters=3)
        entropy_speed["rans_MBps"] = len(grid_big) / t / 1e6
        t = median_time(lambda: _rans_mt_encode(grid_big), iters=3)
        entropy_speed["rans_mt_MBps"] = len(grid_big) / t / 1e6
        import zlib

        t = median_time(
            lambda: zlib.compressobj(9, zlib.DEFLATED, -15).compress(grid_big),
            iters=1,
        )
        entropy_speed["deflate9_MBps"] = len(grid_big) / t / 1e6
        log(f"entropy: rANS {entropy_speed['rans_MBps']:.0f} MB/s "
            f"(mt {entropy_speed['rans_mt_MBps']:.0f}), "
            f"DEFLATE-9 {entropy_speed['deflate9_MBps']:.0f} MB/s")

        # ctx coder (serial vs chunk-parallel) on a real subband payload:
        # one 1080p medium plane, the coder's production input shape.
        try:
            from rustyhgi_tpu.ops.ctxcoder import ctx_encode, ctx_encode_mt
            from rustyhgi_tpu.utils.container import (
                _ctx_pieces,
                _ctx_shift,
                _subband_payload,
                Archive,
            )

            meta_1080 = codec_m.metadata_for(H, W)
            arch_1080 = Archive(meta_1080, np.asarray(codec_m.encode_plane(image)[0]))
            payload = _subband_payload(arch_1080)
            pieces = _ctx_pieces(meta_1080)
            shift = _ctx_shift(meta_1080)
            t = min_time(lambda: ctx_encode(payload, pieces, shift), iters=3)
            entropy_speed["ctx_MBps"] = len(payload) / t / 1e6
            ctx_size = len(ctx_encode(payload, pieces, shift))
            t = min_time(lambda: ctx_encode_mt(payload, pieces, shift), iters=3)
            entropy_speed["ctx_mt_MBps"] = len(payload) / t / 1e6
            mt_size = len(ctx_encode_mt(payload, pieces, shift))
            entropy_speed["ctx_mt_size_overhead_pct"] = (
                100.0 * (mt_size - ctx_size) / ctx_size
            )
            log(f"ctx coder: serial {entropy_speed['ctx_MBps']:.1f} MB/s, "
                f"chunk-parallel {entropy_speed['ctx_mt_MBps']:.1f} MB/s "
                f"(size +{entropy_speed['ctx_mt_size_overhead_pct']:.2f}%)")
        except Exception as e:
            log(f"ctx coder rows failed: {e}")

        # e2e speed path: device encode + threaded rANS for one 1080p
        # plane (the size-optimal writer additionally runs the 20 MB/s
        # DEFLATE candidate by design, so it is entropy-trial-bound; the
        # reference's analogous e2e is DEFLATE-bound at ~20 MPix/s).
        def e2e_speed():
            g, _ = codec_m.encode_plane(image)
            return _rans_mt_encode(np.asarray(g).tobytes())

        # e2e rows are medians of interleaved repeats (VERDICT r3 #2):
        # all paths ride the same tunnel, so alternating the samples
        # makes the comparison drift-fair.  The batched row joins the
        # same interleave (r4 used min_time for it — VERDICT r4 #5).
        e2e_speed()
        fast_blob = codec_m.write_fast(image)  # warm (compile + row est.)
        fast_blob = codec_m.write_fast(image)  # warm the estimated-guess jit
        # The batched path keeps its own guard (r4 outage hardening): a
        # transient failure here must not take down the entropy-stage
        # and link-bandwidth rows below.
        fastb_ok = True
        try:
            codec_m.write_fast_batch(batch)  # warm
            codec_m.write_fast_batch(batch)
        except Exception as e:
            fastb_ok = False
            log(f"batched fast path failed: {e}")
        ts_rans, ts_fast, ts_fastb = [], [], []
        for _ in range(5):
            t0 = time.perf_counter()
            e2e_speed()
            ts_rans.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            codec_m.write_fast(image)
            ts_fast.append(time.perf_counter() - t0)
            if fastb_ok:
                t0 = time.perf_counter()
                codec_m.write_fast_batch(batch)
                ts_fastb.append(time.perf_counter() - t0)
        entropy_speed["e2e_rans_mpix_s"] = W * H / float(np.median(ts_rans)) / 1e6
        log(f"e2e speed path (device encode + threaded rANS): "
            f"{entropy_speed['e2e_rans_mpix_s']:.0f} MPix/s")
        entropy_speed["e2e_fast_mpix_s"] = W * H / float(np.median(ts_fast)) / 1e6
        # VERDICT #4 size criterion: device-coded payload vs host rANS
        # on the same residuals.
        from rustyhgi_tpu.ops.entropy import rans_encode as _re

        host_sz = len(_re(np.asarray(codec_m.encode_plane(image)[0]).tobytes()))
        entropy_speed["rans_tpu_payload_vs_host_rans"] = len(fast_blob) / host_sz
        log(f"e2e fast path (fused device encode + device rANS): "
            f"{entropy_speed['e2e_fast_mpix_s']:.0f} MPix/s; payload "
            f"{len(fast_blob)} B = "
            f"{entropy_speed['rans_tpu_payload_vs_host_rans']:.3f}x host rANS")
        if ts_fastb:
            entropy_speed["e2e_fast_batch_mpix_s"] = (
                npix_batch / float(np.median(ts_fastb)) / 1e6
            )
            log(f"e2e fast path batched x{BATCH}: "
                f"{entropy_speed['e2e_fast_batch_mpix_s']:.0f} MPix/s")

        # -- e2e decomposition (VERDICT r4 #5): the tunnel's D2H swings
        # 2-4x between rounds, so the wall rows above are incomparable
        # across rounds.  Each row is split into (device compute via the
        # chained slope, bytes that cross the link, host entropy time),
        # and a link-NORMALIZED figure is derived at a reference
        # 100 MB/s link — the round-over-round comparable number.
        try:
            from rustyhgi_tpu.ops import tpurans as _trd

            REF_LINK = 100e6  # bytes/s
            decomp = {"link_ref_MBps": 100.0}
            n_pix = W * H
            Lw = _trd.lanes_for(n_pix)
            meta_rows = _trd.meta_rows_for(Lw)
            T_rows = -(-n_pix // Lw)
            est = codec_m._encode_cache.get(("fast_rows", H, W), T_rows)
            guess = min(T_rows, -(-est // 32) * 32)
            head_bytes = (meta_rows + guess) * Lw * 2  # u16 prefix fetch

            _gridfn = codec_m._grid_only_fn((H, W))

            def _fast_dev_step(v):
                g = _gridfn(v)
                out = _trd.encode_device_packed(g.reshape(-1))
                acc = jnp.sum(
                    out[: meta_rows + guess].astype(jnp.int32)
                )
                return v ^ (acc & 255).astype(jnp.uint8)

            # ~6 ms/call (device rANS dominates): k span 8..40 puts
            # ~190 ms between timed points — ample vs RTT jitter while
            # keeping the K_hi chain under a second.
            t_dev_fast = device_seconds_per_call(
                _fast_dev_step, jnp.asarray(image), k_lo=8, k_hi=40,
                floor_bytes=2 * n_pix,
            )
            decomp["e2e_fast"] = {
                "wall_median_s": float(np.median(ts_fast)),
                "device_s": t_dev_fast,
                "link_bytes": head_bytes,
                "payload_bytes": len(fast_blob),
                "link_norm_mpix_s": n_pix / (
                    t_dev_fast + head_bytes / REF_LINK
                ) / 1e6,
            }

            def _enc_step(v):
                g, r = codec_m.encode_plane(v)
                return g ^ r

            t_dev_enc = device_seconds_per_call(
                _enc_step, jnp.asarray(image), k_lo=8, k_hi=232,
                floor_bytes=2 * n_pix,
            )
            grid_bytes = np.asarray(codec_m.encode_plane(image)[0]).tobytes()
            t_host_rans = min_time(
                lambda: _rans_mt_encode(grid_bytes), iters=3
            )
            decomp["e2e_rans"] = {
                "wall_median_s": float(np.median(ts_rans)),
                "device_s": t_dev_enc,
                "host_entropy_s": t_host_rans,
                "link_bytes": n_pix,  # the uint8 grid crosses D2H
                "link_norm_mpix_s": n_pix / (
                    t_dev_enc + t_host_rans + n_pix / REF_LINK
                ) / 1e6,
            }

            _gridfn_b = codec_m._grid_only_fn(batch.shape)

            def _fastb_dev_step(v):
                gs = _gridfn_b(v)
                outs = jax.vmap(
                    lambda g: _trd.encode_device_packed(g.reshape(-1))
                )(gs)
                acc = jnp.sum(
                    outs[:, : meta_rows + guess].astype(jnp.int32)
                )
                return v ^ (acc & 255).astype(jnp.uint8)

            # ~60 ms/call batched: 12 iterations already span ~0.7 s
            # (far above jitter); K=40 chains would run multi-second.
            t_dev_fastb = device_seconds_per_call(
                _fastb_dev_step, dbatch, k_lo=4, k_hi=16,
                floor_bytes=2 * npix_batch,
            )
            decomp["e2e_fast_batch"] = {
                "wall_median_s": float(np.median(ts_fastb)),
                "device_s": t_dev_fastb,
                "link_bytes": BATCH * head_bytes,
                "link_norm_mpix_s": npix_batch / (
                    t_dev_fastb + BATCH * head_bytes / REF_LINK
                ) / 1e6,
            }
            entropy_speed["e2e_decomp"] = decomp
            log("e2e decomposition (@100 MB/s ref link): " + ", ".join(
                f"{k} {v['link_norm_mpix_s']:.1f} MPix/s"
                for k, v in decomp.items() if isinstance(v, dict)
            ))
        except Exception as e:
            log(f"e2e decomposition failed: {e}")

        # Device rANS stage alone (chained slope — the on-chip MB/s).
        from rustyhgi_tpu.ops import tpurans as _tr

        grid_dev = codec_m.encode_plane(image)[0].reshape(-1)

        def _rans_tpu_step(v):
            freq, counts, states, body = _tr.encode_device(v)
            acc = (counts.sum() + states.astype(jnp.int32).sum()
                   + freq.sum() + body.astype(jnp.int32).sum())
            return v ^ (acc & 255).astype(jnp.uint8)

        t = device_seconds_per_call(
            _rans_tpu_step, grid_dev, k_lo=4, k_hi=16,
            floor_bytes=2 * W * H,
        )
        entropy_speed["rans_tpu_device_MBps"] = W * H / t / 1e6
        log(f"device rANS stage: {entropy_speed['rans_tpu_device_MBps']:.0f} MB/s")

        # Host<->device link bandwidth: every e2e number above is bounded
        # by this in the current environment (TPU behind a tunnel); on
        # locally-attached hardware the link runs at PCIe/DMA rates and
        # the e2e bottleneck moves back to the host entropy stage.
        # Two-size slope cancels the dispatch RTT; a fresh device value is
        # produced per fetch (jax caches host copies of unchanged arrays).
        def d2h_time(size):
            f = jax.jit(lambda s: jnp.zeros(size, jnp.uint8) ^ s)
            np.asarray(f(jnp.uint8(1)))
            return min_time(
                lambda: np.asarray(f(jnp.uint8(np.random.randint(2, 200)))),
                iters=3,
            )

        s1, s2 = 2 << 20, 16 << 20
        entropy_speed["d2h_MBps"] = (s2 - s1) / (d2h_time(s2) - d2h_time(s1)) / 1e6

        def h2d_time(size):
            hbuf = np.ones(size, np.uint8)
            jax.device_put(hbuf, dev).block_until_ready()
            return min_time(
                lambda: jax.device_put(hbuf, dev).block_until_ready(), iters=3
            )

        entropy_speed["h2d_MBps"] = (s2 - s1) / (h2d_time(s2) - h2d_time(s1)) / 1e6
        log(f"host<->device link: D2H {entropy_speed['d2h_MBps']:.0f} MB/s, "
            f"H2D {entropy_speed['h2d_MBps']:.0f} MB/s")
    except Exception as e:
        log(f"entropy/size check failed: {e}")

    # -- deep-pyramid level sweep (BASELINE config: ikonos, levels 1-8) -----
    # Guards against deep-level kernel regressions that the levels=4
    # headline cannot see.  Single plane (the per-image serving config);
    # each level uses the backend the codec's auto mode would pick.
    level_sweep = {}
    try:
        from rustyhgi_tpu.ops import pallas_codec as _pc
        from rustyhgi_tpu.utils.imageio import load_luma as _load

        ik = _load("/root/reference/res/ikonos-barcelona-spain.jpg")
        hi, wi = ik.shape
        dik = jax.device_put(jnp.asarray(ik), dev)
        from rustyhgi_tpu.ops import planar as _planar

        sweep_steps = {}
        for lv in range(1, 9):
            # The backend the codec's auto mode would pick on TPU.
            if _planar.supported_planar(lv, hi, wi, quant, "crossed"):
                def stp(v, lv=lv):
                    return _planar.encode_plane_planar(
                        v, lv, quant, "crossed", want_recon=False
                    )[0]
                engine = "planar"
            elif _pc.supported(lv, hi, wi, quant, "crossed"):
                def stp(v, lv=lv):
                    return _pc.encode_plane_pallas(
                        v, lv, quant, "crossed", want_recon=False
                    )[0]
                engine = "pallas"
            else:
                def stp(v, lv=lv):
                    return pyramid.reconstruct_encode(v, lv, quant)
                engine = "xla"
            sweep_steps[lv] = (stp, engine)
        # Five interleaved rounds per level with recorded spread
        # (VERDICT r4 #4): the sweep exists to expose level-dependent
        # kernel pathologies (r3's "L7 cliff"), which two noisy slopes
        # could not distinguish from tunnel drift (r4's L7 samples
        # disagreed 2.3x).
        sweep_samples = {lv: [] for lv in sweep_steps}
        for _ in range(5):
            for lv, (stp, engine) in sweep_steps.items():
                t = device_seconds_per_call(
                    stp, dik, k_lo=8, k_hi=104, floor_bytes=2 * hi * wi
                )
                sweep_samples[lv].append(hi * wi / t / 1e6)
        for lv, (stp, engine) in sweep_steps.items():
            v = np.asarray(sweep_samples[lv])
            med = float(np.median(v))
            level_sweep[str(lv)] = {
                "mpix_s": med, "engine": engine,
                "spread_pct": float((v.max() - v.min()) / med * 100.0),
                "samples": [round(s, 0) for s in sweep_samples[lv]],
            }
            log(f"level_sweep L{lv} ({engine}): {med:.0f} MPix/s "
                f"(spread {level_sweep[str(lv)]['spread_pct']:.0f}%)")
    except Exception as e:
        log(f"level sweep failed: {e}")

    # Headline: the best complete encode to an archivable layout, by
    # MEDIAN of the interleaved rounds (never a single lucky sample).
    # An all-engines-failed run (tunnel outage mid-phase) still writes
    # the details it did measure rather than crashing out.
    if engines:
        headline_engine = max(
            engines, key=lambda k: engines[k]["median_mpix_s"]
        )
        headline_mpixps = engines[headline_engine]["median_mpix_s"]
        headline_spread = engines[headline_engine]["spread_pct"]
    else:
        headline_engine, headline_mpixps, headline_spread = "none", 0.0, 0.0

    details = {
        "device": str(dev),
        "config": {
            "w": W, "h": H, "batch": BATCH, "levels": LEVELS,
            "methodology": (
                "chained fori_loop slope (K=8 vs 232); "
                f"rows = median of {ENGINE_ROUNDS} interleaved rounds"
            ),
        },
        "headline_engine": headline_engine,
        "headline_mpix_s": headline_mpixps,
        "headline_spread_pct": headline_spread,
        "engines": engines,
        "aux_row_samples": {
            k: [round(float(s), 1) for s in v]
            for k, v in aux_samples.items() if v
        },
        "encode_lossless_mpix_s": enc_mpixps,
        "encode_grid_lossless_mpix_s": enc_grid_mpixps,
        "decode_mpix_s": dec_mpixps,
        "decode_subband_mpix_s": dec_sb_mpixps,
        "encode_medium_mpix_s": enc_m_mpixps,
        "pallas": pallas_rows,
        "planar": planar_rows,
        "level_sweep": level_sweep,
        "baseline_scalar_cpp": base,
        "lena_container_bytes": sizes,
        "entropy_MBps": entropy_speed,
    }
    log(json.dumps(details, indent=2))
    try:
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(details, f, indent=2)
    except OSError:
        pass
    try:
        # Keep doc perf tables in lockstep with the artifact (VERDICT r3
        # #7: claims must not drift from measurements).
        import os

        sys.path.insert(
            0,
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"),
        )
        from render_perf import render

        render(details)
    except Exception as e:
        log(f"render_perf failed: {e}")

    vs = (
        headline_mpixps / base["encode_mpix_s"]
        if base.get("encode_mpix_s")
        else 0.0
    )
    print(
        json.dumps(
            {
                "metric": "encode_throughput_lossless_l4",
                "value": round(headline_mpixps, 1),
                "unit": "MPix/s",
                "vs_baseline": round(vs, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
