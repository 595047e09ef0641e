"""Round 2: padless path correctness + perf (ad-hoc, real chip)."""
import sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rustyhgi_tpu.oracle import oracle_encode, oracle_decode
from rustyhgi_tpu.ops.pallas_codec import encode_plane_pallas, decode_plane_pallas, _plan
from rustyhgi_tpu.ops.quantizers import QuantizationLevel, quantize_fn
from bench import device_seconds_per_call

rng = np.random.default_rng(2)
print("plan 1080p L4 lossless:", _plan(1080, 1920, 4, 1))
print("plan 1080p L4 lossy:   ", _plan(1080, 1920, 4, 2))

# correctness: padless (w aligned, h ragged) hits OOB reads + in-kernel row masks
fails = 0
for (h, w) in [(300, 272), (1080, 1920)]:
    for preset in [QuantizationLevel.LOSSLESS, QuantizationLevel.MEDIUM]:
        img = rng.integers(0, 256, (h, w), np.uint8)
        q = quantize_fn(preset)
        go = oracle_encode(img, 4, preset)
        gp, rp = encode_plane_pallas(img, 4, q, "crossed", tile_rows=64 if h < 1000 else None)
        do = oracle_decode(go, 4)
        dp = decode_plane_pallas(go, 4, "crossed", tile_rows=64 if h < 1000 else None)
        ok = np.array_equal(np.asarray(gp), go) and np.array_equal(np.asarray(dp), do)
        if not ok:
            fails += 1
            print(f"PADLESS MISMATCH {h}x{w} {preset.name}")
print("padless correctness fails:", fails)
if fails:
    sys.exit(1)

H, W, N, L = 1080, 1920, 8, 4
pix = N * H * W
x = jnp.asarray(rng.integers(0, 256, (N, H, W), np.uint8))
q0 = quantize_fn(QuantizationLevel.LOSSLESS)
qm = quantize_fn(QuantizationLevel.MEDIUM)

def bench(name, step):
    s = device_seconds_per_call(step, x, floor_bytes=2 * pix)
    print(f"{name}: {s*1e6:.0f} us -> {pix/s/1e6:.0f} MPix/s")

bench("pallas grid lossless", lambda v: encode_plane_pallas(v, L, q0, "crossed", want_recon=False)[0])
bench("pallas grid medium  ", lambda v: encode_plane_pallas(v, L, qm, "crossed", want_recon=False)[0])
bench("pallas decode       ", lambda v: decode_plane_pallas(v, L, "crossed"))
