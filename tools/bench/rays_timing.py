"""Time the three intersection paths on the procedural hall (TPU)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402

from wayverb_tpu.core.surfaces import Surface                # noqa: E402
from wayverb_tpu.raytracer import tracer                     # noqa: E402
from wayverb_tpu.raytracer.accel import build_ray_grid       # noqa: E402
from wayverb_tpu.raytracer.mt_pallas import \
    build_pallas_triangles                                   # noqa: E402
from wayverb_tpu.raytracer.scenes import procedural_hall     # noqa: E402

num_rays = 1 << 16
depth = 40
soup, ntris = procedural_hall()
surf = Surface(absorption=jnp.full((1, 8), 0.1),
               scattering=jnp.full((1, 8), 0.1))
src, rcv = (2.0, 1.7, 3.0), (6.0, 1.9, 9.0)
key = jax.random.PRNGKey(7)

paths = {
    "pallas_mt": build_pallas_triangles(soup),
    "dense": None,
}
which = sys.argv[1:] or list(paths)

for name in which:
    accel = paths[name] if name in paths else build_ray_grid(soup)

    @jax.jit
    def run():
        res = tracer.trace(soup, surf, src, rcv, key, num_rays=num_rays,
                           depth=depth, max_time=1.0, accel=accel)
        return jnp.sum(res.histogram)

    v = float(run())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run())
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name}: {dt:.3f}s  {num_rays*depth/dt:.3e} ray-bounces/s  "
          f"energy {v:.4e}", flush=True)
