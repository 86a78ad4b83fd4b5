import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from wayverb_tpu.core.geometry import Box
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.descriptor import grid_spacing, COURANT_SQ
from wayverb_tpu.waveguide.box_boundary import (apply_regions, region_step,
    initial_region_states)

side = (224, 224, 256)
fs = 3333.33
dx = grid_spacing(340.0, 1.0 / fs)
box = Box((0,0,0), (dx*(side[0]-4), dx*(side[1]-4), dx*(side[2]-4)))
mesh = wgrun.shoebox_mesh(box, np.full((1,8),0.1), dx, fs)
dims = mesh.descriptor.dimensions
s = mesh.structure
regions = tuple(mesh.regions)
order = s.filter_order
n = np.prod(dims)
cur = jnp.zeros(dims); prev = jnp.zeros(dims)
states = initial_region_states(list(regions), order)

def bench_scan(name, body, carry, steps=20, reps=5):
    g = jax.jit(lambda c: jax.lax.scan(lambda cc,_: (body(cc), None), c, None, length=steps)[0])
    o = jax.block_until_ready(g(carry))
    t0=time.perf_counter()
    for _ in range(reps): o = jax.block_until_ready(g(carry))
    dt=(time.perf_counter()-t0)/reps/steps
    print(f"{name:34s} {dt*1e3:8.3f} ms  {n/dt/1e9:7.2f} Gnode/s  {n*12/dt/819e9*100:5.1f}% SoL")
    return dt

# a) regions only
def ba(c):
    cur, prev, st = c
    nxt, st = apply_regions(cur*1.0, cur, prev, st, list(regions), s.coef_b, s.coef_a)
    return (nxt, cur, st)
bench_scan("regions only", ba, (cur, prev, states))

# b) DUS only (write zeros blocks into nxt)
blocks = [jnp.zeros(r.size) for r in regions]
def bb(c):
    nxt, prev = c
    for r, blk in zip(regions, blocks):
        sl = tuple(slice(st, st+sz) for st, sz in zip(r.start, r.size))
        nxt = nxt.at[sl].set(blk + prev[sl])
    return (nxt, prev)
bench_scan("26x DUS only", bb, (cur, prev))

# c) region math only (no DUS)
def bc(c):
    cur, prev, st = c
    acc = 0.0
    new_states = []
    for r, stt in zip(regions, st):
        p, ns = region_step(cur, prev, stt, r, s.coef_b, s.coef_a)
        acc = acc + jnp.sum(p)
        new_states.append(ns)
    return (cur + acc*0.0, prev, new_states)
bench_scan("region math only", bc, (cur, prev, states))

# d) improved pallas: halo planes + iota box mask
XT = 8
inside_idx = np.argwhere(np.asarray(mesh.inside))
lo = tuple(int(v) for v in inside_idx.min(0)); hi = tuple(int(v) for v in inside_idx.max(0))

def _kernel_box(lo, hi, cur_lo_ref, cur_ref, cur_hi_ref, prev_ref, out_ref):
    i = pl.program_id(0)
    c = cur_ref[...]
    up = jnp.concatenate([cur_lo_ref[...], c[:-1]], axis=0)
    dn = jnp.concatenate([c[1:], cur_hi_ref[...]], axis=0)
    acc = up + dn
    zy = jnp.zeros_like(c[:, :1])
    acc = acc + jnp.concatenate([zy, c[:, :-1]], axis=1)
    acc = acc + jnp.concatenate([c[:, 1:], zy], axis=1)
    zz = jnp.zeros_like(c[:, :, :1])
    acc = acc + jnp.concatenate([zz, c[:, :, :-1]], axis=2)
    acc = acc + jnp.concatenate([c[:, :, 1:], zz], axis=2)
    x = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0) + i * XT
    y = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    z = jax.lax.broadcasted_iota(jnp.int32, c.shape, 2)
    m = ((x >= lo[0]) & (x <= hi[0]) & (y >= lo[1]) & (y <= hi[1])
         & (z >= lo[2]) & (z <= hi[2]))
    out_ref[...] = jnp.where(m, COURANT_SQ * acc - prev_ref[...], 0.0)

def interior_box(cur, prev):
    X, Y, Z = cur.shape
    nb = X // XT
    spec = lambda im, bs: pl.BlockSpec(bs, im, memory_space=pltpu.VMEM)
    k = functools.partial(_kernel_box, lo, hi)
    return pl.pallas_call(
        k, grid=(nb,),
        in_specs=[spec(lambda i: (jnp.maximum(i*XT-1, 0), 0, 0), (1, Y, Z)),
                  spec(lambda i: (i, 0, 0), (XT, Y, Z)),
                  spec(lambda i: (jnp.minimum((i+1)*XT, X-1), 0, 0), (1, Y, Z)),
                  spec(lambda i: (i, 0, 0), (XT, Y, Z))],
        out_specs=spec(lambda i: (i, 0, 0), (XT, Y, Z)),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), cur.dtype),
    )(cur, cur, cur, prev)

def bd(c):
    cur, prev = c
    return (interior_box(cur, prev), cur)
bench_scan("interior box-mask halo pallas", bd, (cur, prev))

# e) combined: new kernel + regions
def be(c):
    cur, prev, st = c
    nxt = interior_box(cur, prev)
    nxt, st = apply_regions(nxt, cur, prev, st, list(regions), s.coef_b, s.coef_a)
    return (nxt, cur, st)
bench_scan("new kernel + regions", be, (cur, prev, states))
