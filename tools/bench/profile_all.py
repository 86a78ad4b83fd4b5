"""Reliable timing on the axon backend: block_until_ready does not block,
so every timed jit returns a scalar that we float() each rep (device->host
transfer of a computed scalar is the only reliable sync)."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from wayverb_tpu.waveguide.descriptor import COURANT_SQ
from wayverb_tpu.waveguide.stencil_pallas import interior_step_pallas
from wayverb_tpu.waveguide.box_fused import (spec_from_inside, plane_boundary_step,
                                             splice_stencil)

dims = (224, 224, 256)
X, Y, Z = dims
XT = 8
NSTEP = 1000
key = jax.random.PRNGKey(0)
cur0 = jax.random.normal(key, dims, jnp.float32) * 1e-3
prev0 = jax.random.normal(key, dims, jnp.float32) * 1e-3
mask = jnp.ones(dims, jnp.float32)
inside = np.zeros(dims, dtype=bool); inside[2:-3, 2:-3, 2:-3] = True
spec = spec_from_inside(inside)
geom = spec.geom_array()
face_b = jnp.tile(jnp.asarray([[1.0, .1, .1, .1, .1, .1, .1]]), (6, 1))
face_a = jnp.tile(jnp.asarray([[1.0, .1, .1, .1, .1, .1, .1]]), (6, 1))
states0 = spec.initial_states(6)
planes0 = tuple(jnp.zeros(spec.plane_shape(p), jnp.float32) for p in range(6))

def timeit(name, f, *args, reps=3):
    v = float(f(*args))  # compile + run
    t0 = time.perf_counter()
    for _ in range(reps):
        v = float(f(*args))
    dt = (time.perf_counter() - t0) / reps / NSTEP
    print(f"{name}: {dt*1e3:.3f} ms/step", flush=True)

def scanned(stepfn):
    @jax.jit
    def f(cur, prev, states):
        def body(c, _):
            cur, prev, states = c
            cur, prev, states = stepfn(cur, prev, states)
            return (cur, prev, states), ()
        (cur, prev, states), _ = jax.lax.scan(body, (cur, prev, states), None,
                                              length=NSTEP)
        return cur[5, 5, 5]
    return f

# 1. XLA elementwise (3 traffics)
timeit("xla axpy        ", scanned(lambda c, p, s: (0.99*c + 0.01*p, c, s)),
       cur0, prev0, states0)

# 2. old 3-blockspec kernel (6 traffics)
timeit("old 3-spec      ", scanned(lambda c, p, s: (interior_step_pallas(c, p, mask), c, s)),
       cur0, prev0, states0)

# 3. fused kernel with zero planes (3.25 traffics)
timeit("fused kernel    ", scanned(lambda c, p, s: (splice_stencil(geom, c, p, planes0), c, s)),
       cur0, prev0, states0)

# 4. planes only
def planes_step(c, p, s):
    pplus, s = plane_boundary_step(c, p, s, spec, face_b, face_a)
    return c + 0.0 * pplus[0].sum(), p, s
timeit("planes only     ", planes_step and scanned(planes_step), cur0, prev0, states0)

# 5. full fused step
def full_step(c, p, s):
    pplus, s = plane_boundary_step(c, p, s, spec, face_b, face_a)
    return splice_stencil(geom, c, p, pplus), c, s
timeit("full fused step ", scanned(full_step), cur0, prev0, states0)
