import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

dims = (224, 224, 256)
X, Y, Z = dims
XT = 8
key = jax.random.PRNGKey(0)
cur = jax.random.normal(key, dims, jnp.float32)
prev = jax.random.normal(key, dims, jnp.float32)

blk = pl.BlockSpec((XT, Y, Z), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

def copy_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = a_ref[...] + b_ref[...]

def call(cur, prev):
    return pl.pallas_call(copy_kernel, grid=(X // XT,),
        in_specs=[blk, blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(dims, cur.dtype),
    )(cur, prev)

@jax.jit
def scan(cur, prev):
    def body(c, _):
        cur, prev = c
        return (call(cur, prev), cur), ()
    c, _ = jax.lax.scan(body, (cur, prev), None, length=100)
    return c[0]

out = scan(cur, prev); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(3):
    out = scan(cur, prev); jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/3/100
gbs = 3 * X*Y*Z*4 / dt / 1e9
print(f"add kernel (3 traffics): {dt*1e3:.3f} ms/step = {gbs:.0f} GB/s", flush=True)

# same but pure XLA
@jax.jit
def scan_xla(cur, prev):
    def body(c, _):
        cur, prev = c
        return (cur + prev, cur), ()
    c, _ = jax.lax.scan(body, (cur, prev), None, length=100)
    return c[0]
out = scan_xla(cur, prev); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(3):
    out = scan_xla(cur, prev); jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/3/100
gbs = 3 * X*Y*Z*4 / dt / 1e9
print(f"xla add (3 traffics): {dt*1e3:.3f} ms/step = {gbs:.0f} GB/s", flush=True)
