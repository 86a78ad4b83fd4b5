import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time
import numpy as np
import jax, jax.numpy as jnp

NSTEP = 64
key = jax.random.PRNGKey(0)

def timeit(name, f, *args, reps=3):
    v = float(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        v = float(f(*args))
    dt = (time.perf_counter() - t0) / reps / NSTEP
    print(f"{name}: {dt*1e3:.3f} ms/step", flush=True)

def make(shape, unroll):
    cur = jax.random.normal(key, shape, jnp.float32) * 1e-3
    prev = jax.random.normal(key, shape, jnp.float32) * 1e-3
    @jax.jit
    def f(cur, prev):
        def body(c, _):
            cur, prev = c
            return (0.99*cur + 0.01*prev, cur), ()
        (cur, prev), _ = jax.lax.scan(body, (cur, prev), None, length=NSTEP,
                                      unroll=unroll)
        return cur.ravel()[0]
    return f, cur, prev

for shape in ((8, 8, 128), (224, 224, 256)):
    for unroll in (1, 4, 16):
        f, c, p = make(shape, unroll)
        timeit(f"axpy {shape} unroll={unroll:2d}", f, c, p)
