"""Fine-grained passthrough ablation (ad-hoc, real chip)."""
import sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from bench import device_seconds_per_call

rng = np.random.default_rng(3)
H, W, N = 1080, 1920, 8
pix = N * H * W
x = jnp.asarray(rng.integers(0, 256, (N, H, W), np.uint8))
th, halo, wc = 224, 16, W // 4
hp_t = -(-1088 // th) * th
n_tiles = hp_t // th

def variant(stage):
    def fn(img):
        n = img.shape[0]
        xw = lax.bitcast_convert_type(img.reshape(n, H, wc, 4), jnp.uint32)
        def kernel(main_ref, halo_ref, out_ref):
            if stage == "io":
                out_ref[0] = main_ref[0]
                return
            xv = jnp.concatenate([main_ref[0], halo_ref[0]], axis=0)
            if stage == "concat":
                out_ref[0] = xv[:th]
                return
            r = xv.shape[0]
            r4 = xv.reshape(r // 4, 4, wc)
            rows = [r4[:, ry, :] for ry in range(4)]
            if stage == "rows":
                s = jnp.stack([q[: th // 4] for q in rows], axis=1)
                out_ref[0] = s.reshape(th, wc)
                return
            # bytes: full decomp + repack (no math)
            D = [[((rows[ry] >> jnp.uint32(8 * rx)) & jnp.uint32(255)).astype(jnp.int32)
                  for rx in range(4)] for ry in range(4)]
            words = []
            for ry in range(4):
                wv = (D[ry][0][: th // 4].astype(jnp.uint32)
                      | (D[ry][1][: th // 4].astype(jnp.uint32) << 8)
                      | (D[ry][2][: th // 4].astype(jnp.uint32) << 16)
                      | (D[ry][3][: th // 4].astype(jnp.uint32) << 24))
                words.append(wv)
            s = jnp.stack(words, axis=1)
            out_ref[0] = s.reshape(th, wc)
        out = pl.pallas_call(
            kernel,
            grid=(n, n_tiles),
            in_specs=[
                pl.BlockSpec((1, th, wc), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, halo, wc), lambda b, t, m=th // halo: (b, (t + 1) * m, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, th, wc), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, hp_t, wc), jnp.uint32),
        )(xw, xw)
        g = lax.bitcast_convert_type(out, jnp.uint8).reshape(n, hp_t, W)
        return g[:, :H, :]
    return fn

for stage in ("io", "concat", "rows", "bytes"):
    f = variant(stage)
    s = device_seconds_per_call(f, x, floor_bytes=2 * pix)
    print(f"{stage:8s}: {s*1e6:.0f} us -> {pix/s/1e6:.0f} MPix/s")
