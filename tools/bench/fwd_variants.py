"""Forward fused-box variants: is the scan's (next, current) carry rotation
costing a hidden 45 MB copy per step?  Times the baseline scan against
unroll=2/4 (which lets XLA alias the ping-pong buffers across consecutive
steps) at the bench shape."""
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
from wayverb_tpu.waveguide.box_fused import (initial_box_carry,  # noqa: E402
                                             make_box_body)
from wayverb_tpu.waveguide.descriptor import grid_spacing    # noqa: E402
from wayverb_tpu.waveguide.receivers import NodeReceiver     # noqa: E402
from wayverb_tpu.waveguide.sources import (HardSource,       # noqa: E402
                                           impulse_signal)

side = (224, 224, 256)
steps = 1000
fs = 3333.33
dx = grid_spacing(340.0, 1.0 / fs)
box = Box((0, 0, 0), (dx * (side[0] - 4), dx * (side[1] - 4),
                      dx * (side[2] - 4)))
mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), dx, fs)
desc = mesh.descriptor
src = mesh.require_inside(tuple(np.asarray(box.centre())))
source = HardSource(
    node_idx=jnp.asarray(desc.flat_index(src), dtype=jnp.int32),
    signal=impulse_signal(steps, 1.0))
receiver = NodeReceiver(node_idx=jnp.asarray(
    desc.flat_index(src) + 2, dtype=jnp.int32))
body = make_box_body(mesh.structure, mesh.box_spec, source, receiver)
init = initial_box_carry(mesh.structure, mesh.box_spec, receiver)
nodes = desc.num_nodes
print("nodes:", nodes, flush=True)


def timed(name, fn):
    f = jax.jit(fn)
    float(f())                                  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f())
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / steps
    print(f"{name}: {dt*1e6:.1f} us/step  "
          f"{nodes/dt/1e9:.2f} G upd/s", flush=True)


def make(unroll):
    def fn():
        carry, outputs = jax.lax.scan(body, init, jnp.arange(steps),
                                      unroll=unroll)
        return outputs[-1] + 0.0 * carry[0][8, 8, 8]
    return fn


for u in (1, 2, 4):
    timed(f"unroll={u}", make(u))
