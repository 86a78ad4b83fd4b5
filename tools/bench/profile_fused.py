import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from wayverb_tpu.waveguide.box_fused import (spec_from_inside, plane_boundary_step,
                                             splice_stencil)

dims = (224, 224, 256)
inside = np.zeros(dims, dtype=bool)
inside[2:-3, 2:-3, 2:-3] = True
spec = spec_from_inside(inside)
key = jax.random.PRNGKey(0)
cur = jax.random.normal(key, dims, jnp.float32)
prev = jax.random.normal(key, dims, jnp.float32)
planes = tuple(jax.random.normal(key, spec.plane_shape(p), jnp.float32) for p in range(6))
states = spec.initial_states(6)
face_b = jnp.tile(jnp.asarray([[1.0, .1, .1, .1, .1, .1, .1]]), (6, 1))
face_a = jnp.tile(jnp.asarray([[1.0, .1, .1, .1, .1, .1, .1]]), (6, 1))
geom = spec.geom_array()

def timeit(name, fn, *args, reps=50):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.3f} ms")
    return dt

# kernel only, steady state loop via scan to avoid dispatch overhead
@jax.jit
def kernel_scan(cur, prev, planes):
    def body(c, _):
        cur, prev = c
        nxt = splice_stencil(geom, cur, prev, planes)
        return (nxt, cur), ()
    (cur, prev), _ = jax.lax.scan(body, (cur, prev), None, length=100)
    return cur

@jax.jit
def planes_scan(cur, prev, states):
    def body(c, _):
        states, x = c
        pplus, states = plane_boundary_step(cur, prev, states, spec, face_b, face_a)
        return (states, x + sum(p.sum() for p in pplus)), ()
    (states, x), _ = jax.lax.scan(body, (states, 0.0), None, length=100)
    return x

@jax.jit
def full_scan(cur, prev, states):
    def body(c, _):
        cur, prev, states = c
        pplus, states = plane_boundary_step(cur, prev, states, spec, face_b, face_a)
        nxt = splice_stencil(geom, cur, prev, pplus)
        return (nxt, cur, states), ()
    c, _ = jax.lax.scan(body, (cur, prev, states), None, length=100)
    return c[0]

t = timeit("kernel x100", kernel_scan, cur, prev, planes, reps=3)
print(f"  per step: {t*10:.1f} us")
t = timeit("planes x100", planes_scan, cur, prev, states, reps=3)
print(f"  per step: {t*10:.1f} us")
t = timeit("full x100", full_scan, cur, prev, states, reps=3)
print(f"  per step: {t*10:.1f} us")
