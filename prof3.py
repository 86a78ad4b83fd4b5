import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from wayverb_tpu.waveguide.descriptor import COURANT_SQ

X, Y, Z = 224, 224, 256
n = X*Y*Z
cur = jnp.zeros((X,Y,Z)); prev = jnp.zeros((X,Y,Z))

def bench(name, step, steps=20, reps=5):
    g = jax.jit(lambda c: jax.lax.scan(lambda cc,_: ((step(cc[0],cc[1]),cc[0]), None), c, None, length=steps)[0])
    o = jax.block_until_ready(g((cur, prev)))
    t0=time.perf_counter()
    for _ in range(reps): o = jax.block_until_ready(g((cur,prev)))
    dt=(time.perf_counter()-t0)/reps/steps
    print(f"{name:40s} {dt*1e3:7.3f} ms  {n/dt/1e9:6.2f} Gn/s  {n*12/dt/819e9*100:5.1f}% SoL")

def make_1d(XT, mode):
    def kern(cur_lo, c_ref, cur_hi, prev_ref, out_ref):
        c = c_ref[...]
        acc = jnp.zeros_like(c)
        if mode in ("x","xyz"):
            up = jnp.concatenate([cur_lo[...], c[:-1]], axis=0)
            dn = jnp.concatenate([c[1:], cur_hi[...]], axis=0)
            acc += up + dn
        if mode in ("y","xyz"):
            zy = jnp.zeros_like(c[:, :1])
            acc += jnp.concatenate([zy, c[:, :-1]], axis=1)
            acc += jnp.concatenate([c[:, 1:], zy], axis=1)
        if mode in ("z","xyz"):
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

for XT in (4, 8, 16):
    bench(f"copy only XT={XT}", make_1d(XT, "none"))
bench("x-shift only XT=8", make_1d(8, "x"))
bench("y-shift only XT=8", make_1d(8, "y"))
bench("z-shift only XT=8", make_1d(8, "z"))
for XT in (4, 8, 16):
    bench(f"full xyz XT={XT}", make_1d(XT, "xyz"))
