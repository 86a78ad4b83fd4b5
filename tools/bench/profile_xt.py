"""Kernel-only timing at different XT tile heights (monkeypatched)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402

from wayverb_tpu.waveguide import box_fused as bf            # noqa: E402

XTS = [int(v) for v in sys.argv[1:]] or [8, 16, 32]
steps = 500
dims = (224, 224, 256)
inside = np.zeros(dims, dtype=bool)
inside[2:-2, 2:-2, 2:-2] = True
spec = bf.spec_from_inside(inside)
num_nodes = int(np.prod(dims))

rng = np.random.default_rng(0)
cur = jnp.asarray(rng.normal(size=dims).astype(np.float32)) * 1e-3
prev = jnp.asarray(rng.normal(size=dims).astype(np.float32)) * 1e-3
planes0 = tuple(jnp.zeros(spec.plane_shape(p), jnp.float32)
                for p in range(6))
geom = spec.geom_array()

for xt in XTS:
    bf.XT = xt

    def body(carry, t):
        cur, prev = carry
        nxt, _ = bf.fused_step(spec, geom, cur, prev, planes0)
        return (nxt, cur), nxt[8, 8, 8]

    @jax.jit
    def kernel_only():
        carry, outputs = jax.lax.scan(body, (cur, prev),
                                      jnp.arange(steps))
        return jnp.sum(outputs)

    try:
        float(kernel_only())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(kernel_only())
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / steps
        sol = 819e9 / 12.0
        ups = num_nodes / dt
        print(f"XT={xt}: {dt*1e3:.4f} ms/step  {ups:.3e} upd/s "
              f" {ups/sol*100:.1f}% SoL", flush=True)
    except Exception as e:
        print(f"XT={xt}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
