"""Isolate pallas codec kernel cost from host-side pad/bitcast (ad-hoc)."""
import sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
sys.path.insert(0, "/root/repo")
from rustyhgi_tpu.ops import pallas_codec as pc
from bench import device_seconds_per_call

rng = np.random.default_rng(1)
H, W, N, L = 1080, 1920, 8, 4
pix = N * H * W
x = jnp.asarray(rng.integers(0, 256, (N, H, W), np.uint8))

def bench(name, step, v, fb):
    s = device_seconds_per_call(step, v, floor_bytes=fb)
    print(f"{name}: {s*1e6:.0f} us -> {pix/s/1e6:.0f} MPix/s")

# full path at different tile sizes
for th in (128, 256, 544):
    bench(f"full th={th}", lambda v, th=th: pc.encode_plane_pallas(v, L, None, "crossed", want_recon=False, tile_rows=th)[0], x, 2*pix)

# pad+bitcast alone
hp_t, wp, wc, th, halo, n_tiles = pc._plan(H, W, L, 1)
print("plan:", hp_t, wp, wc, th, halo, n_tiles)
def prep(v):
    xw = pc._to_words(v, hp_t + halo, wp)
    return lax.bitcast_convert_type(xw, jnp.uint8).reshape(v.shape[0], hp_t + halo, wp)[:, :H, :W]
bench("pad+bitcast+crop only", prep, x, 2*pix)

# kernel only: pre-padded u32 in, u32 out (u32->u32 chain needs same shape; use grid-shaped xor carry)
xw0 = jax.jit(lambda v: pc._to_words(v, hp_t + halo, wp))(x)
def kern_only(vw):
    grid, _ = pc._encode_batch_words(vw, H, W, L, None, "crossed", False, None) if hasattr(pc, "_encode_batch_words") else (None, None)
    return grid
# fall back: measure _encode_batch minus prep by subtraction instead.
