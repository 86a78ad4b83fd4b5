import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from wayverb_tpu.waveguide.descriptor import COURANT_SQ

dims = (224, 224, 256)
X, Y, Z = dims
XT = 8
key = jax.random.PRNGKey(0)
cur = jax.random.normal(key, dims, jnp.float32)
prev = jax.random.normal(key, dims, jnp.float32)

def timeit(name, fn, *args, n=100, reps=3):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps / n
    print(f"{name}: {dt*1e3:.3f} ms/step", flush=True)

def make_kernel(mode):
    def kern(cur_hbm, prev_ref, out_ref, buf, sems):
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        def slab_dmas(slot, j):
            base = j * XT
            return (
                pltpu.make_async_copy(cur_hbm.at[pl.ds(jnp.maximum(base - 1, 0), 1)],
                                      buf.at[slot, pl.ds(0, 1)], sems.at[slot, 0]),
                pltpu.make_async_copy(cur_hbm.at[pl.ds(base, XT)],
                                      buf.at[slot, pl.ds(1, XT)], sems.at[slot, 1]),
                pltpu.make_async_copy(cur_hbm.at[pl.ds(jnp.minimum(base + XT, X - 1), 1)],
                                      buf.at[slot, pl.ds(XT + 1, 1)], sems.at[slot, 2]),
            )
        @pl.when(i == 0)
        def _():
            for d in slab_dmas(0, 0): d.start()
        @pl.when(i + 1 < nb)
        def _():
            for d in slab_dmas((i + 1) % 2, i + 1): d.start()
        for d in slab_dmas(i % 2, i): d.wait()
        b = buf[i % 2]
        c = b[1:XT+1]
        if mode == "dma_only":
            out_ref[...] = c + prev_ref[...]
        elif mode == "roll":
            acc = b[0:XT] + b[2:XT+2]
            acc += pltpu.roll(c, 1, 1) + pltpu.roll(c, Y - 1, 1)
            acc += pltpu.roll(c, 1, 2) + pltpu.roll(c, Z - 1, 2)
            out_ref[...] = COURANT_SQ * acc - prev_ref[...]
        elif mode == "concat":
            acc = b[0:XT] + b[2:XT+2]
            zy = jnp.zeros_like(c[:, :1])
            acc = acc + jnp.concatenate([zy, c[:, :-1]], axis=1)
            acc = acc + jnp.concatenate([c[:, 1:], zy], axis=1)
            zz = jnp.zeros_like(c[:, :, :1])
            acc = acc + jnp.concatenate([zz, c[:, :, :-1]], axis=2)
            acc = acc + jnp.concatenate([c[:, :, 1:], zz], axis=2)
            out_ref[...] = COURANT_SQ * acc - prev_ref[...]
    return kern

def make_call(mode):
    def call(cur, prev):
        nb = X // XT
        blk3 = pl.BlockSpec((XT, Y, Z), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(make_kernel(mode),
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), blk3],
            out_specs=blk3,
            out_shape=jax.ShapeDtypeStruct((X, Y, Z), cur.dtype),
            scratch_shapes=[pltpu.VMEM((2, XT + 2, Y, Z), cur.dtype),
                            pltpu.SemaphoreType.DMA((2, 3))],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        )(cur, prev)
    def scan(cur, prev):
        def body(c, _):
            cur, prev = c
            return (call(cur, prev), cur), ()
        c, _ = jax.lax.scan(body, (cur, prev), None, length=100)
        return c[0]
    return jax.jit(scan)

f = make_call("dma_only")
out = f(cur, prev); jax.block_until_ready(out)
t0=time.perf_counter()
for _ in range(3):
    out = f(cur, prev)
    s_ = float(out.sum())
dt=(time.perf_counter()-t0)/3/100
print(f"dma_only (forced sum={s_:.3e}): {dt*1e3:.3f} ms/step", flush=True)
timeit("roll    ", make_call("roll"), cur, prev)
timeit("concat  ", make_call("concat"), cur, prev)
