import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time
import numpy as np
import jax, jax.numpy as jnp
from wayverb_tpu.core.geometry import Box
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.receivers import NodeReceiver
from wayverb_tpu.waveguide.run import execute
from wayverb_tpu.waveguide.sources import HardSource, impulse_signal

side = (224, 224, 256)
steps = 100
fs = 3333.33
dx = grid_spacing(340.0, 1.0 / fs)
box = Box((0, 0, 0), (dx * (side[0] - 4), dx * (side[1] - 4), dx * (side[2] - 4)))
mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), dx, fs)
desc = mesh.descriptor
print("dims", desc.dimensions, "box_spec", mesh.box_spec is not None)
num_nodes = desc.num_nodes
centre = tuple(np.asarray(box.centre()))
src_loc = mesh.require_inside(centre)
rcv_loc = mesh.require_inside(tuple(np.asarray(centre) + np.asarray([0.0, 0.0, dx * 4])))
source = HardSource(node_idx=jnp.asarray(desc.flat_index(src_loc), dtype=jnp.int32),
                    signal=impulse_signal(steps, 1.0))
receiver = NodeReceiver(node_idx=jnp.asarray(desc.flat_index(rcv_loc), dtype=jnp.int32))
t0=time.perf_counter()
out = execute(mesh, source, receiver, steps)
jax.block_until_ready(out["outputs"])
print("compile+first run", time.perf_counter()-t0, "stable", out["stable"])
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    out = execute(mesh, source, receiver, steps)
    jax.block_until_ready(out["outputs"])
dt = (time.perf_counter() - t0) / reps
ups = num_nodes * steps / dt
sol = 819e9 / 12.0
print(f"step time {dt/steps*1e3:.3f} ms, {ups:.3e} updates/s, vs SoL {ups/sol:.3f}")
