import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

dims = (224, 224, 256)
X, Y, Z = dims
XT = 8
nb = X // XT
NSTEP = 1000
key = jax.random.PRNGKey(0)
cur0 = jax.random.normal(key, dims, jnp.float32) * 1e-3
prev0 = jax.random.normal(key, dims, jnp.float32) * 1e-3
geom = jnp.zeros(9, jnp.int32)

def timeit(name, call):
    @jax.jit
    def f(cur, prev):
        def b(c, _):
            cur, prev = c
            return (call(cur, prev), cur), ()
        c, _ = jax.lax.scan(b, (cur, prev), None, length=NSTEP)
        return c[0][8, 8, 8]
    v = float(f(cur0, prev0))
    t0 = time.perf_counter()
    for _ in range(3):
        v = float(f(cur0, prev0))
    dt = (time.perf_counter() - t0) / 3 / NSTEP
    print(f"{name}: {dt*1e3:.3f} ms/step", flush=True)

blk = lambda im: pl.BlockSpec((XT, Y, Z), im, memory_space=pltpu.VMEM)

# A: plain 2-input add kernel, GridSpec (baseline, 3 traffics)
def k_add(a, b, o):
    o[...] = a[...] + 0.99 * b[...]
def call_A(cur, prev):
    return pl.pallas_call(k_add, grid=(nb,),
        in_specs=[blk(lambda i: (i, 0, 0)), blk(lambda i: (i, 0, 0))],
        out_specs=blk(lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(dims, jnp.float32))(cur, prev)
timeit("A add plain           ", call_A)

# B: same but PrefetchScalarGridSpec
def k_add2(g, a, b, o):
    o[...] = a[...] + 0.99 * b[...]
def call_B(cur, prev):
    gs = pltpu.PrefetchScalarGridSpec(num_scalar_prefetch=1, grid=(nb,),
        in_specs=[blk(lambda i, g: (i, 0, 0)), blk(lambda i, g: (i, 0, 0))],
        out_specs=blk(lambda i, g: (i, 0, 0)))
    return pl.pallas_call(k_add2, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct(dims, jnp.float32))(geom, cur, prev)
timeit("B add prefetch-spec   ", call_B)

# C: add kernel with rolling-window structure (scratch + shifted maps + when)
def k_roll(a, b, o, slab, tail):
    i = pl.program_id(0)
    @pl.when(i >= 1)
    def _():
        o[...] = slab[...] + 0.99 * b[...] + 1e-6 * tail[0, 0, 0]
    tail[...] = slab[XT-1:XT]
    slab[...] = a[...]
def call_C(cur, prev):
    return pl.pallas_call(k_roll, grid=(nb + 1,),
        in_specs=[blk(lambda i: (jnp.minimum(i, nb - 1), 0, 0)),
                  blk(lambda i: (jnp.maximum(i - 1, 0), 0, 0))],
        out_specs=blk(lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
        out_shape=jax.ShapeDtypeStruct(dims, jnp.float32),
        scratch_shapes=[pltpu.VMEM((XT, Y, Z), jnp.float32),
                        pltpu.VMEM((1, Y, Z), jnp.float32)])(cur, prev)
timeit("C add rolling-window  ", call_C)

# D: rolling window without the when (compute every step)
def k_roll2(a, b, o, slab):
    o[...] = slab[...] + 0.99 * b[...]
    slab[...] = a[...]
def call_D(cur, prev):
    return pl.pallas_call(k_roll2, grid=(nb + 1,),
        in_specs=[blk(lambda i: (jnp.minimum(i, nb - 1), 0, 0)),
                  blk(lambda i: (jnp.maximum(i - 1, 0), 0, 0))],
        out_specs=blk(lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
        out_shape=jax.ShapeDtypeStruct(dims, jnp.float32),
        scratch_shapes=[pltpu.VMEM((XT, Y, Z), jnp.float32)])(cur, prev)
timeit("D roll no-when        ", call_D)

# E: plain add but with clamped maps on grid nb+1 (no scratch)
def call_E(cur, prev):
    return pl.pallas_call(k_add, grid=(nb + 1,),
        in_specs=[blk(lambda i: (jnp.minimum(i, nb - 1), 0, 0)),
                  blk(lambda i: (jnp.maximum(i - 1, 0), 0, 0))],
        out_specs=blk(lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
        out_shape=jax.ShapeDtypeStruct(dims, jnp.float32))(cur, prev)
timeit("E add clamped maps    ", call_E)
