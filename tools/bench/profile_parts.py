import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time
import numpy as np
import jax, jax.numpy as jnp
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from wayverb_tpu.waveguide.box_fused import (spec_from_inside, _take_plane,
                                             splice_stencil, XT, _fwd_kernel)
from wayverb_tpu.waveguide.descriptor import COURANT_SQ

dims = (224, 224, 256)
X, Y, Z = dims
inside = np.zeros(dims, dtype=bool)
inside[2:-3, 2:-3, 2:-3] = True
spec = spec_from_inside(inside)
key = jax.random.PRNGKey(0)
cur = jax.random.normal(key, dims, jnp.float32)
prev = jax.random.normal(key, dims, jnp.float32)
geom = spec.geom_array()

def timeit(name, fn, *args, n=100, reps=3):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps / n
    print(f"{name}: {dt*1e3:.3f} ms/step")

# 1. bare stencil kernel (no splice, no planes) via scan
def _bare_kernel(geom_ref, cur_hbm, prev_ref, out_ref, buf, sems):
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
        for dma in slab_dmas(0, 0): dma.start()
    @pl.when(i + 1 < nb)
    def _():
        for dma in slab_dmas((i + 1) % 2, i + 1): dma.start()
    for dma in slab_dmas(i % 2, i): dma.wait()
    b = buf[i % 2]
    c = b[1:XT+1]
    acc = b[0:XT] + b[2:XT+2]
    zy = jnp.zeros_like(c[:, :1])
    acc = acc + jnp.concatenate([zy, c[:, :-1]], axis=1)
    acc = acc + jnp.concatenate([c[:, 1:], zy], axis=1)
    zz = jnp.zeros_like(c[:, :, :1])
    acc = acc + jnp.concatenate([zz, c[:, :, :-1]], axis=2)
    acc = acc + jnp.concatenate([c[:, :, 1:], zz], axis=2)
    out_ref[...] = COURANT_SQ * acc - prev_ref[...]

def bare_call(geom, cur, prev):
    nb = X // XT
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((XT, Y, Z), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((XT, Y, Z), lambda i, g: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, XT + 2, Y, Z), cur.dtype),
                        pltpu.SemaphoreType.DMA((2, 3))])
    return pl.pallas_call(_bare_kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), cur.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(geom, cur, prev)

@jax.jit
def bare_scan(cur, prev):
    def body(c, _):
        cur, prev = c
        return (bare_call(geom, cur, prev), cur), ()
    c, _ = jax.lax.scan(body, (cur, prev), None, length=100)
    return c[0]

timeit("bare stencil", bare_scan, cur, prev)

# 2. plane slices only
@jax.jit
def slices_scan(cur, prev):
    def body(c, _):
        cur, prev = c
        acc = 0.0
        for a in range(3):
            for pc in (2, dims[a]-3):
                acc = acc + _take_plane(cur, a, pc).sum()
        return (cur + 0*acc, prev), ()
    c, _ = jax.lax.scan(body, (cur, prev), None, length=100)
    return c[0]
timeit("6 plane slices", slices_scan, cur, prev)
