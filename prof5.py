import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from wayverb_tpu.waveguide.descriptor import COURANT_SQ

X, Y, Z = 224, 224, 256
n = X*Y*Z
key = jax.random.PRNGKey(0)
cur = jax.random.normal(key, (X,Y,Z)) * 0.01
prev = jax.random.normal(jax.random.fold_in(key,1), (X,Y,Z)) * 0.01

def timed(fn, *args):
    """Total wall time with fetch-forced completion."""
    out = fn(*args)
    x = float(out[0][0,0,0])  # forces full materialization
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = fn(*args)
        x = float(out[0][0,0,0])
    return (time.perf_counter() - t0) / reps

def report(name, step):
    gs = {}
    for steps in (40, 140):
        gs[steps] = jax.jit(lambda c, p, steps=steps: jax.lax.scan(
            lambda cc,_: ((step(cc[0],cc[1]), cc[0]), None), (c,p), None,
            length=steps)[0])
    t40 = timed(gs[40], cur, prev)
    t140 = timed(gs[140], cur, prev)
    dt = (t140 - t40) / 100.0
    print(f"{name:34s} {dt*1e3:7.3f} ms/step  {n/dt/1e9:6.2f} Gn/s  {n*12/dt/819e9*100:5.1f}% SoL")
    return dt

def make_kernel(XT):
    def kern(cur_lo, c_ref, cur_hi, prev_ref, out_ref):
        c = c_ref[...]
        up = jnp.concatenate([cur_lo[...], c[:-1]], axis=0)
        dn = jnp.concatenate([c[1:], cur_hi[...]], axis=0)
        acc = up + dn
        zy = jnp.zeros_like(c[:, :1])
        acc += jnp.concatenate([zy, c[:, :-1]], axis=1)
        acc += jnp.concatenate([c[:, 1:], zy], axis=1)
        zz = jnp.zeros_like(c[:, :, :1])
        acc += jnp.concatenate([zz, c[:, :, :-1]], axis=2)
        acc += jnp.concatenate([c[:, :, 1:], zz], axis=2)
        out_ref[...] = COURANT_SQ*acc - prev_ref[...]
    nb = X // XT
    spec = lambda im, bs: pl.BlockSpec(bs, im, memory_space=pltpu.VMEM)
    def step(c, p):
        return pl.pallas_call(kern, grid=(nb,),
            in_specs=[spec(lambda i: (jnp.maximum(i*XT-1,0),0,0),(1,Y,Z)),
                      spec(lambda i: (i,0,0),(XT,Y,Z)),
                      spec(lambda i: (jnp.minimum((i+1)*XT,X-1),0,0),(1,Y,Z)),
                      spec(lambda i: (i,0,0),(XT,Y,Z))],
            out_specs=spec(lambda i: (i,0,0),(XT,Y,Z)),
            out_shape=jax.ShapeDtypeStruct((X,Y,Z), c.dtype))(c,c,c,p)
    return step

from wayverb_tpu.waveguide.stencil_pallas import interior_step_pallas
mask = jnp.ones((X,Y,Z))
report("OLD 3-slab kernel", lambda c,p: interior_step_pallas(c,p,mask))
for XT in (4, 8, 16):
    report(f"halo-plane kernel XT={XT}", make_kernel(XT))
