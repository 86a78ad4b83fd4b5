"""Time the fused box forward (and optionally backward) at bench shape."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main():
    import jax
    import jax.numpy as jnp
    from wayverb_tpu.core.geometry import Box
    from wayverb_tpu.waveguide import run as wgrun
    from wayverb_tpu.waveguide.box_fused import (initial_box_carry,
                                                 make_box_body)
    from wayverb_tpu.waveguide.descriptor import grid_spacing
    from wayverb_tpu.waveguide.receivers import NodeReceiver
    from wayverb_tpu.waveguide.sources import HardSource, impulse_signal

    side = (224, 224, 256)
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    fs = 3333.33
    dx = grid_spacing(340.0, 1.0 / fs)
    box = Box((0, 0, 0), (dx * (side[0] - 4), dx * (side[1] - 4),
                          dx * (side[2] - 4)))
    mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), dx, fs)
    desc = mesh.descriptor
    num_nodes = desc.num_nodes
    centre = tuple(np.asarray(box.centre()))
    src_loc = mesh.require_inside(centre)
    rcv_loc = mesh.require_inside(
        tuple(np.asarray(centre) + np.asarray([0.0, 0.0, dx * 2])))
    source = HardSource(
        node_idx=jnp.asarray(desc.flat_index(src_loc), dtype=jnp.int32),
        signal=impulse_signal(steps, 1.0))
    receiver = NodeReceiver(
        node_idx=jnp.asarray(desc.flat_index(rcv_loc), dtype=jnp.int32))

    body = make_box_body(mesh.structure, mesh.box_spec, source, receiver)
    init = initial_box_carry(mesh.structure, mesh.box_spec, receiver)

    @jax.jit
    def forward():
        carry, outputs = jax.lax.scan(body, init, jnp.arange(steps))
        return jnp.sum(outputs ** 2) + 0.0 * carry[0][8, 8, 8]

    v = float(forward())
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        v = float(forward())
        times.append(time.perf_counter() - t0)
    dt = min(times)
    ups = num_nodes * steps / dt
    sol = 819e9 / 12.0
    print(f"forward: {dt*1e3/steps:.4f} ms/step  {ups:.3e} upd/s  "
          f"{ups/sol*100:.1f}% SoL  value={v:.3e}  times={times}")


if __name__ == "__main__":
    main()
