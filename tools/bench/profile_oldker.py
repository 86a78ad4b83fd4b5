import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time
import numpy as np
import jax, jax.numpy as jnp
from wayverb_tpu.waveguide.stencil_pallas import interior_step_pallas

dims = (224, 224, 256)
key = jax.random.PRNGKey(0)
cur = jax.random.normal(key, dims, jnp.float32)
prev = jax.random.normal(key, dims, jnp.float32)
mask = jnp.ones(dims, jnp.float32)

@jax.jit
def scan_old(cur, prev):
    def body(c, _):
        cur, prev = c
        return (interior_step_pallas(cur, prev, mask), cur), ()
    c, _ = jax.lax.scan(body, (cur, prev), None, length=100)
    return c[0]

out = scan_old(cur, prev); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(3):
    out = scan_old(cur, prev); jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/3/100
print(f"old 3-blockspec kernel: {dt*1e3:.3f} ms/step", flush=True)
