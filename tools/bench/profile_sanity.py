import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time
import numpy as np
import jax, jax.numpy as jnp

dims = (224, 224, 256)
key = jax.random.PRNGKey(0)
cur = jax.random.normal(key, dims, jnp.float32) * 1e-3
prev = jax.random.normal(key, dims, jnp.float32) * 1e-3

def make(n):
    @jax.jit
    def scan(cur, prev):
        def body(c, _):
            cur, prev = c
            return (0.99 * cur + 0.01 * prev, cur), ()
        c, _ = jax.lax.scan(body, (cur, prev), None, length=n)
        return c[0]
    return scan

for n in (100, 400, 1600):
    f = make(n)
    out = f(cur, prev); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(cur, prev)
        jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/3
    print(f"n={n}: total {dt*1e3:.2f} ms, per step {dt/n*1e6:.1f} us", flush=True)
# with host transfer forcing
f = make(400)
out = f(cur, prev); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(3):
    v = float(f(cur, prev)[0, 0, 0])
dt = (time.perf_counter()-t0)/3
print(f"forced n=400: total {dt*1e3:.2f} ms, per step {dt/400*1e6:.1f} us", flush=True)
