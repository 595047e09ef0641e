import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A, B = 256, 512
x = jnp.arange(A * B, dtype=jnp.int32).astype(jnp.uint8).reshape(A, B)
xi = jnp.arange(A * B, dtype=jnp.int32).reshape(A, B)

def run(name, kernel, out_shape, inp):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.jit(f)(inp)
        r.block_until_ready()
        print(f"OK   {name}: {r.shape} {r.dtype}")
        return r
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e).split(chr(10))[0][:160]}")

# transpose int32
run("transpose int32", lambda i, o: o.__setitem__(slice(None), i[:].T),
    jax.ShapeDtypeStruct((B, A), jnp.int32), xi)
# transpose uint8
run("transpose uint8", lambda i, o: o.__setitem__(slice(None), i[:].T),
    jax.ShapeDtypeStruct((B, A), jnp.uint8), x)
# concat lane
def kc(i, o):
    o[:] = jnp.concatenate([i[:], i[:]], axis=1)
run("concat lane", kc, jax.ShapeDtypeStruct((A, 2*B), jnp.uint8), x)
# concat sublane
def kcs(i, o):
    o[:] = jnp.concatenate([i[:], i[:]], axis=0)
run("concat sublane", kcs, jax.ShapeDtypeStruct((2*A, B), jnp.uint8), x)
# lax.slice strided on lane
def ks(i, o):
    o[:] = lax.slice(i[:], (0, 0), (A, B), (1, 2))
run("lax.slice stride-2 lane", ks, jax.ShapeDtypeStruct((A, B//2), jnp.uint8), x)
# lax.slice strided on sublane
def ks2(i, o):
    o[:] = lax.slice(i[:], (0, 0), (A, B), (2, 1))
run("lax.slice stride-2 sublane", ks2, jax.ShapeDtypeStruct((A//2, B), jnp.uint8), x)
# u16 arithmetic & pltpu.bitcast u16->u8 (sublane unpack = row interleave)
def ku(i, o):
    v = i[:].astype(jnp.uint16) | (jnp.uint16(1) << 8)
    o[:] = pltpu.bitcast(v, jnp.uint8)
run("u16 math + bitcast u16->u8", ku, jax.ShapeDtypeStruct((2*A, B), jnp.uint8), x)
# int32 bitcast to u8 (sublane unpack x4)
def k32(i, o):
    o[:] = pltpu.bitcast(i[:], jnp.uint8)
run("bitcast i32->u8", k32, jax.ShapeDtypeStruct((4*A, B), jnp.uint8), xi)
# gather via take along lane? dynamic_slice in lane
def kr(i, o):
    v = i[:].astype(jnp.int32)
    r = pltpu.roll(v, shift=1, axis=1)
    o[:] = r.astype(jnp.uint8)
run("pltpu.roll +1 lane", kr, jax.ShapeDtypeStruct((A, B), jnp.uint8), x)
# jnp.roll negative
def kr2(i, o):
    v = i[:].astype(jnp.int32)
    o[:] = jnp.roll(v, -1, axis=1).astype(jnp.uint8)
run("jnp.roll -1 lane", kr2, jax.ShapeDtypeStruct((A, B), jnp.uint8), x)
# reshape merging leading dims (free)
x3 = x.reshape(2, A//2, B)
def km(i, o):
    o[:] = i[:].reshape(A, B)
try:
    f = pl.pallas_call(km, out_shape=jax.ShapeDtypeStruct((A, B), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    r = jax.jit(f)(x3); r.block_until_ready()
    print(f"OK   reshape merge leading: {r.shape}")
except Exception as e:
    print(f"FAIL reshape merge leading: {str(e).split(chr(10))[0][:160]}")
