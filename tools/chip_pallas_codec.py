"""On-chip validation + benchmark of the fused Pallas codec (ad-hoc)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rustyhgi_tpu.oracle import oracle_encode, oracle_decode
from rustyhgi_tpu.ops.pallas_codec import encode_plane_pallas, decode_plane_pallas
from rustyhgi_tpu.ops.quantizers import QuantizationLevel, quantize_fn
from rustyhgi_tpu.ops import pyramid
from bench import device_seconds_per_call

print("device:", jax.devices()[0])

# --- correctness on hardware (compiled Mosaic) ---
rng = np.random.default_rng(1)
fails = 0
for (h, w) in [(300, 260)]:
    for levels in [4]:
        for preset in [QuantizationLevel.LOSSLESS, QuantizationLevel.MEDIUM]:
            for pred in ["crossed"]:
                img = rng.integers(0, 256, (h, w), np.uint8)
                q = quantize_fn(preset)
                go = oracle_encode(img, levels, preset, pred)
                gp, rp = encode_plane_pallas(img, levels, q, pred, tile_rows=64)
                dp = decode_plane_pallas(go, levels, pred, tile_rows=64)
                do = oracle_decode(go, levels, pred)
                ok = (np.array_equal(np.asarray(gp), go)
                      and np.array_equal(np.asarray(dp), do)
                      and (rp is None or np.array_equal(np.asarray(rp), do)))
                if not ok:
                    fails += 1
                    print(f"HW MISMATCH {h}x{w} L{levels} {preset.name} {pred}")
print("hardware correctness fails:", fails)
if fails:
    sys.exit(1)

# --- throughput, 1080p x8 levels=4 ---
H, W, N, L = 1080, 1920, 8, 4
x = jnp.asarray(rng.integers(0, 256, (N, H, W), np.uint8))
pix = N * H * W
fb = 2 * pix  # read + write u8

def bench(name, step):
    s = device_seconds_per_call(step, x, floor_bytes=fb)
    print(f"{name}: {s*1e6:.0f} us -> {pix/s/1e6:.0f} MPix/s")

q0 = quantize_fn(QuantizationLevel.LOSSLESS)
qm = quantize_fn(QuantizationLevel.MEDIUM)

bench("pallas grid lossless", lambda v: encode_plane_pallas(v, L, q0, "crossed", want_recon=False)[0])
bench("pallas grid medium  ", lambda v: encode_plane_pallas(v, L, qm, "crossed", want_recon=False)[0])
bench("pallas decode       ", lambda v: decode_plane_pallas(v, L, "crossed"))
bench("xla grid lossless   ", lambda v: pyramid.reconstruct_encode(v, L, q0))
def xla_sb(v):
    a, sb, _ = pyramid.encode_subbands(v, L, q0, want_recon=False)
    # fold outputs back to a u8 image-shaped tensor cheaply for the chain:
    return v ^ a[..., :1, :1].astype(jnp.uint8)
bench("xla subband lossless", xla_sb)
bench("xla grid medium     ", lambda v: pyramid.reconstruct_encode(v, L, qm))
bench("xla decode          ", lambda v: pyramid.decode_plane(v, L))
