"""Compile-only HW smoke of the fused box path: fwd + checkpointed bwd.

Round-2 shipped a backward that OOM'd scoped VMEM on the real chip because
the VJP was only ever exercised in interpret mode (VERDICT r2 "What's
weak").  This gate compiles BOTH directions at the bench shape
(224x224x256) on the real backend before any snapshot.  Run:

    python tools/bench/hw_smoke.py [X Y Z]

Exit 0 = both compile (and a 4-step run executes).
"""

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

    shape = (224, 224, 256)
    if len(sys.argv) == 4:
        shape = tuple(int(v) for v in sys.argv[1:4])

    fs = 3333.33
    dx = grid_spacing(340.0, 1.0 / fs)
    box = Box((0, 0, 0), (dx * (shape[0] - 4), dx * (shape[1] - 4),
                          dx * (shape[2] - 4)))
    mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), dx, fs)
    desc = mesh.descriptor
    centre = tuple(np.asarray(box.centre()))
    src_loc = mesh.require_inside(centre)
    rcv_loc = mesh.require_inside(
        tuple(np.asarray(centre) + np.asarray([0.0, 0.0, dx * 4])))

    steps = 8
    source = HardSource(
        node_idx=jnp.asarray(desc.flat_index(src_loc), dtype=jnp.int32),
        signal=impulse_signal(steps, 1.0))
    receiver = NodeReceiver(
        node_idx=jnp.asarray(desc.flat_index(rcv_loc), dtype=jnp.int32))

    t0 = time.time()

    @jax.jit
    def forward():
        body = make_box_body(mesh.structure, mesh.box_spec, source, receiver)
        init = initial_box_carry(mesh.structure, mesh.box_spec, receiver)
        carry, outputs = jax.lax.scan(body, init, jnp.arange(steps))
        return outputs[-1] + 0.0 * carry[0][8, 8, 8]

    v = float(forward())
    print(f"forward ok ({time.time()-t0:.1f}s) value={v}")

    t0 = time.time()

    def loss(coef_b):
        import dataclasses as dc
        structure = dc.replace(mesh.structure, coef_b=coef_b)
        body = make_box_body(structure, mesh.box_spec, source, receiver,
                             kernel_inject=False)
        init = initial_box_carry(structure, mesh.box_spec, receiver)
        seg = 4

        @jax.checkpoint
        def segment(carry, t0_):
            return jax.lax.scan(lambda c, i: body(c, t0_ + i), carry,
                                jnp.arange(seg))

        carry, outputs = jax.lax.scan(
            segment, init, jnp.arange(-(-steps // seg)) * seg)
        return jnp.sum(outputs ** 2)

    @jax.jit
    def fwdbwd():
        return jnp.sum(jax.grad(loss)(mesh.structure.coef_b))

    g = float(fwdbwd())
    print(f"backward ok ({time.time()-t0:.1f}s) grad_sum={g}")
    print("HW_SMOKE_PASS")


if __name__ == "__main__":
    main()
