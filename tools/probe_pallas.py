"""Probe which dyadic-split primitives Mosaic supports in-kernel (ad-hoc, real chip)."""
import functools, traceback
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A, B = 256, 512
x = jnp.arange(A * B, dtype=jnp.int32).astype(jnp.uint8).reshape(A, B)

def run(name, kernel, out_shape):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.jit(f)(x)
        r.block_until_ready()
        print(f"OK   {name}: out shape {r.shape} dtype {r.dtype}")
        return r
    except Exception as e:
        msg = str(e).split('\n')[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return None

# 1. lane strided slice
def k1(x_ref, o_ref):
    o_ref[:] = x_ref[:][:, ::2]
run("lane strided slice x[:, ::2]", k1, jax.ShapeDtypeStruct((A, B//2), jnp.uint8))

# 2. reshape + index on lane
def k2(x_ref, o_ref):
    v = x_ref[:].reshape(A, B//2, 2)
    o_ref[:] = v[:, :, 0]
run("reshape (a,b/2,2) + [...,0]", k2, jax.ShapeDtypeStruct((A, B//2), jnp.uint8))

# 3. lax.bitcast_convert_type u8 pairs -> u16
def k3(x_ref, o_ref):
    v = lax.bitcast_convert_type(x_ref[:].reshape(A, B//2, 2), jnp.uint16)
    o_ref[:] = (v & jnp.uint16(0xFF)).astype(jnp.uint8)
run("lax.bitcast u8[...,2]->u16", k3, jax.ShapeDtypeStruct((A, B//2), jnp.uint8))

# 4. pltpu.bitcast sublane pack u8->u16
def k4(x_ref, o_ref):
    v = pltpu.bitcast(x_ref[:], jnp.uint16)  # (A/2, B)
    o_ref[:] = (v & jnp.uint16(0xFF)).astype(jnp.uint8)
run("pltpu.bitcast u8->u16 (sublane)", k4, jax.ShapeDtypeStruct((A//2, B), jnp.uint8))

# 5. sublane reshape split (a/2,2,b) + index middle
def k5(x_ref, o_ref):
    v = x_ref[:].reshape(A//2, 2, B)
    o_ref[:] = v[:, 0, :]
run("reshape (a/2,2,b) + [:,0,:]", k5, jax.ShapeDtypeStruct((A//2, B), jnp.uint8))

# 6. lane interleave via reshape: stack 2 -> (a, b, 2) -> reshape (a, 2b)
def k6(x_ref, o_ref):
    v = jnp.stack([x_ref[:], x_ref[:]], axis=-1)
    o_ref[:] = v.reshape(A, 2*B)
run("lane interleave stack+reshape", k6, jax.ShapeDtypeStruct((A, 2*B), jnp.uint8))

# 7. jnp.pad in kernel
def k7(x_ref, o_ref):
    o_ref[:] = jnp.pad(x_ref[:], ((0,1),(0,1)))
run("jnp.pad", k7, jax.ShapeDtypeStruct((A+1, B+1), jnp.uint8))

# 8. pltpu.roll on lane dim (int32)
def k8(x_ref, o_ref):
    v = x_ref[:].astype(jnp.int32)
    o_ref[:] = pltpu.roll(v, shift=-1, axis=1).astype(jnp.uint8)
run("pltpu.roll lane", k8, jax.ShapeDtypeStruct((A, B), jnp.uint8))

# 9. static contiguous lane slice (not 128-aligned)
def k9(x_ref, o_ref):
    o_ref[:] = x_ref[:][:, 3:3+B//2]
run("static lane slice misaligned", k9, jax.ShapeDtypeStruct((A, B//2), jnp.uint8))
