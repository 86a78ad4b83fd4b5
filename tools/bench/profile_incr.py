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
LAM = 1.0 / 3.0

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

def rolled(mode):
    def kern(a_ref, b_ref, o_ref, slab, tail):
        i = pl.program_id(0)
        @pl.when(i >= 1)
        def _():
            c = slab[...]
            up = jnp.concatenate([tail[...], c[:-1]], axis=0)
            dn = jnp.concatenate([c[1:], a_ref[0:1]], axis=0)
            acc = up + dn
            if mode >= 1:   # y shifts via concat
                zy = jnp.zeros_like(c[:, :1])
                acc = acc + jnp.concatenate([zy, c[:, :-1]], axis=1)
                acc = acc + jnp.concatenate([c[:, 1:], zy], axis=1)
            if mode >= 2:   # z shifts via concat
                zz = jnp.zeros_like(c[:, :, :1])
                acc = acc + jnp.concatenate([zz, c[:, :, :-1]], axis=2)
                acc = acc + jnp.concatenate([c[:, :, 1:], zz], axis=2)
            o_ref[...] = LAM * acc - b_ref[...]
        tail[...] = slab[XT-1:XT]
        slab[...] = a_ref[...]
    return kern

def rolled_roll():
    def kern(a_ref, b_ref, o_ref, slab, tail):
        i = pl.program_id(0)
        @pl.when(i >= 1)
        def _():
            c = slab[...]
            up = jnp.concatenate([tail[...], c[:-1]], axis=0)
            dn = jnp.concatenate([c[1:], a_ref[0:1]], axis=0)
            acc = up + dn
            acc = acc + pltpu.roll(c, 1, 1) + pltpu.roll(c, Y - 1, 1)
            acc = acc + pltpu.roll(c, 1, 2) + pltpu.roll(c, Z - 1, 2)
            o_ref[...] = LAM * acc - b_ref[...]
        tail[...] = slab[XT-1:XT]
        slab[...] = a_ref[...]
    return kern

def mk(kern):
    def call(cur, prev):
        return pl.pallas_call(kern, grid=(nb + 1,),
            in_specs=[blk(lambda i: (jnp.minimum(i, nb - 1), 0, 0)),
                      blk(lambda i: (jnp.maximum(i - 1, 0), 0, 0))],
            out_specs=blk(lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            out_shape=jax.ShapeDtypeStruct(dims, jnp.float32),
            scratch_shapes=[pltpu.VMEM((XT, Y, Z), jnp.float32),
                            pltpu.VMEM((1, Y, Z), jnp.float32)])(cur, prev)
    return call

timeit("x-shifts only      ", mk(rolled(0)))
timeit("x+y concat         ", mk(rolled(1)))
timeit("x+y+z concat       ", mk(rolled(2)))
timeit("x + roll y,z       ", mk(rolled_roll()))
