"""Stage ablation of the fused encode kernel (ad-hoc, real chip)."""
import sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
import rustyhgi_tpu.ops.pallas_codec as pc
from bench import device_seconds_per_call

rng = np.random.default_rng(3)
H, W, N, L = 1080, 1920, 8, 4
pix = N * H * W
x = jnp.asarray(rng.integers(0, 256, (N, H, W), np.uint8))

def variant(stage, th=224):
    halo = 16
    hp_t = -(-1088 // th) * th
    wc = W // 4
    n_tiles = hp_t // th
    def fn(img):
        n = img.shape[0]
        xw = lax.bitcast_convert_type(img.reshape(n, H, wc, 4), jnp.uint32)
        def kernel(main_ref, halo_ref, out_ref):
            t = pl.program_id(1)
            xv = jnp.concatenate([main_ref[0], halo_ref[0]], axis=0)
            D = pc._bytes16_from_u32(xv)
            D = pc._mask_rows(D, H - t * th)
            if stage == "passthrough":
                gp = D
            elif stage == "levelB":
                gp = [[None]*4 for _ in range(4)]
                c00, c01, c10, c11 = D[0][0], D[0][2], D[2][0], D[2][2]
                sl00 = pc._shift_lane(c00); sl10 = pc._shift_lane(c10)
                ss00 = pc._shift_sub(c00); ss01 = pc._shift_sub(c01)
                preds = {
                    (0,0): pc._tree_crossed(c00, c01, c10, c11),
                    (0,1): pc._tree_crossed(c01, sl00, c11, sl10),
                    (1,0): pc._tree_crossed(c10, c11, ss00, ss01),
                    (1,1): pc._tree_crossed(c11, sl10, ss01, pc._shift_sub(sl00)),
                }
                for a in (0,1):
                    for b in (0,1):
                        P = preds[(a,b)]
                        gp[2*a][2*b+1] = (D[2*a][2*b+1] - P) & 255
                        gp[2*a+1][2*b] = (D[2*a+1][2*b] - P) & 255
                        gp[2*a+1][2*b+1] = (D[2*a+1][2*b+1] - P) & 255
                gp[0][0], gp[0][2], gp[2][0], gp[2][2] = c00, c01, c10, c11
            else:  # full
                gp, _ = pc._encode_core(D, L, None, pc._tree_crossed, pc._NO_MASK, 1, 1)
            out_ref[0] = pc._pack_u32(gp, th // 4)
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

for stage in ("passthrough", "levelB", "full"):
    for th in (136, 224, 544):
        f = variant(stage, th)
        s = device_seconds_per_call(f, x, floor_bytes=2 * pix)
        print(f"{stage:12s} th={th}: {s*1e6:.0f} us -> {pix/s/1e6:.0f} MPix/s")
