import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time
import numpy as np
import jax, jax.numpy as jnp
from wayverb_tpu.core.geometry import Box
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.box_fused import make_box_body, initial_box_carry
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.receivers import NodeReceiver
from wayverb_tpu.waveguide.sources import HardSource, impulse_signal

NSTEP = 1000
side = (224, 224, 256)
fs = 3333.33
dx = grid_spacing(340.0, 1.0 / fs)
box = Box((0, 0, 0), (dx * (side[0] - 4), dx * (side[1] - 4), dx * (side[2] - 4)))
mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), dx, fs)
desc = mesh.descriptor
centre = tuple(np.asarray(box.centre()))
src = mesh.require_inside(centre)
rcv = mesh.require_inside(tuple(np.asarray(centre) + np.asarray([0, 0, dx * 4])))

class NullSource:
    def inject(self, f, t): return f
    def patch_plane(self, p, a, c, d, t): return p

class NullReceiver:
    def init_state(self, dtype=jnp.float32): return ()
    def tap(self, f, s): return s, jnp.float32(0)

def bench(name, source, receiver):
    body = make_box_body(mesh.structure, mesh.box_spec, source, receiver)
    init = initial_box_carry(mesh.structure, mesh.box_spec, receiver)
    @jax.jit
    def run():
        carry, outputs = jax.lax.scan(body, init, jnp.arange(NSTEP))
        return carry[0][8, 8, 8]
    v = float(run())
    t0 = time.perf_counter()
    for _ in range(3):
        v = float(run())
    dt = (time.perf_counter() - t0) / 3 / NSTEP
    print(f"{name}: {dt*1e3:.3f} ms/step", flush=True)

source = HardSource(node_idx=jnp.asarray(desc.flat_index(src), dtype=jnp.int32),
                    signal=impulse_signal(NSTEP, 1.0))
receiver = NodeReceiver(node_idx=jnp.asarray(desc.flat_index(rcv), dtype=jnp.int32))
bench("null src + null rcv", NullSource(), NullReceiver())
bench("hard src + null rcv", source, NullReceiver())
bench("null src + node rcv", NullSource(), receiver)
bench("full               ", source, receiver)
