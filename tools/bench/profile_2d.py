import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time
import numpy as np
import jax, jax.numpy as jnp
from wayverb_tpu.waveguide.descriptor import COURANT_SQ

dims = (224, 224, 256)
X, Y, Z = dims
N = X * Y
key = jax.random.PRNGKey(0)
cur = jax.random.normal(key, (N, Z), jnp.float32)
prev = jax.random.normal(key, (N, Z), jnp.float32)
# inside mask as 2D
inside = np.zeros(dims, dtype=bool); inside[2:-3, 2:-3, 2:-3] = True
mask = jnp.asarray(inside.reshape(N, Z).astype(np.float32))

def step2d(cur, prev):
    acc = jnp.pad(cur[Y:], ((0, Y), (0, 0))) + jnp.pad(cur[:-Y], ((Y, 0), (0, 0)))
    acc += jnp.pad(cur[1:], ((0, 1), (0, 0))) + jnp.pad(cur[:-1], ((1, 0), (0, 0)))
    acc += jnp.pad(cur[:, 1:], ((0, 0), (0, 1))) + jnp.pad(cur[:, :-1], ((0, 0), (1, 0)))
    return (COURANT_SQ * acc - prev) * mask

@jax.jit
def scan2d(cur, prev):
    def body(c, _):
        cur, prev = c
        return (step2d(cur, prev), cur), ()
    c, _ = jax.lax.scan(body, (cur, prev), None, length=100)
    return c[0]

t0 = time.perf_counter()
out = scan2d(cur, prev); jax.block_until_ready(out)
print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(3):
    out = scan2d(cur, prev); jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/3/100
print(f"xla 2d stencil: {dt*1e3:.3f} ms/step", flush=True)
