"""Time the general-mesh (gather-boundary) path at production scale."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402

from wayverb_tpu.core.geometry import Box                    # noqa: E402
from wayverb_tpu.waveguide import run as wgrun               # noqa: E402
from wayverb_tpu.waveguide.descriptor import grid_spacing    # noqa: E402
from wayverb_tpu.waveguide.receivers import NodeReceiver     # noqa: E402
from wayverb_tpu.waveguide.sources import (HardSource,       # noqa: E402
                                           impulse_signal)

side = (224, 224, 256)
steps = 200
fs = 3333.33
dx = grid_spacing(340.0, 1.0 / fs)
box = Box((0, 0, 0), (dx * (side[0] - 4), dx * (side[1] - 4),
                      dx * (side[2] - 4)))
mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), dx, fs)
desc = mesh.descriptor
centre = tuple(np.asarray(box.centre()))
src = mesh.require_inside(centre)
source = HardSource(
    node_idx=jnp.asarray(desc.flat_index(src), dtype=jnp.int32),
    signal=impulse_signal(steps, 1.0))
receiver = NodeReceiver(node_idx=jnp.asarray(
    desc.flat_index(src) + 2, dtype=jnp.int32))
print("boundary nodes:", int(mesh.structure.b_node_idx.shape[0]),
      flush=True)


@jax.jit
def general():
    out = wgrun.run_waveguide(mesh.structure, desc.dimensions, source,
                              receiver, steps)
    return jnp.sum(out["outputs"] ** 2)


v = float(general())
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    float(general())
    ts.append(time.perf_counter() - t0)
dt = min(ts) / steps
print(f"general path: {dt*1e3:.3f} ms/step (fused path ~0.42)", flush=True)
