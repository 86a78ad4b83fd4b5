import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from wayverb_tpu.waveguide.descriptor import COURANT_SQ

X, Y, Z = 224, 224, 256
n = X*Y*Z
key = jax.random.PRNGKey(0)
cur = jax.random.normal(key, (X,Y,Z)) * 0.01
prev = jax.random.normal(jax.random.fold_in(key,1), (X,Y,Z)) * 0.01

XT = 8
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

for steps in (1, 20, 100):
    g = jax.jit(lambda c, p: jax.lax.scan(
        lambda cc,_: ((step(cc[0],cc[1]), cc[0]), None), (c,p), None,
        length=steps)[0])
    o = jax.block_until_ready(g(cur, prev))
    t0=time.perf_counter(); reps=3
    for _ in range(reps): o = jax.block_until_ready(g(cur, prev))
    dt=(time.perf_counter()-t0)/reps/steps
    print(f"steps={steps:4d} {dt*1e3:7.3f} ms/step  {n/dt/1e9:6.2f} Gn/s  checksum {float(jnp.sum(jnp.abs(o[0]))):.4f}")
