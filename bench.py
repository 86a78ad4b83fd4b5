"""Benchmark: waveguide mesh node-updates/s on one chip.

Prints ONE JSON line:
  {"metric": "waveguide_node_updates_per_s_per_chip", "value": N,
   "unit": "updates/s", "vs_baseline": N}

``vs_baseline`` is measured vs the HBM speed-of-light estimate for the
stencil (the reference publishes no throughput numbers — BASELINE.md — so
roofline fraction is the honest denominator): 3 × 4 B per node update
(read current + previous, write next; neighbour reads hit cache/fusion)
against the chip's HBM bandwidth.
"""

import json
import os
import sys
import time

import numpy as np

# per-chip HBM bandwidth estimates (bytes/s)
HBM_BW = {
    "v5e": 819e9,
    "v5p": 2765e9,
    "v4": 1228e9,
    "cpu": 50e9,
}
BYTES_PER_NODE = 12.0


def detect_platform():
    import jax
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return "v5e"
    if "v5p" in kind or "v5" in kind:
        return "v5p"
    if "v4" in kind:
        return "v4"
    if d.platform == "cpu":
        return "cpu"
    return "v5e"


def main():
    import jax
    import jax.numpy as jnp
    from wayverb_tpu.core.geometry import Box
    from wayverb_tpu.waveguide import run as wgrun
    from wayverb_tpu.waveguide.descriptor import grid_spacing
    from wayverb_tpu.waveguide.receivers import NodeReceiver
    from wayverb_tpu.waveguide.run import execute
    from wayverb_tpu.waveguide.sources import HardSource, impulse_signal

    platform = detect_platform()
    # a production-scale mesh: ~12.8 M nodes (the reference operating point
    # for a concert hall at 500 Hz cutoff is of this order)
    if platform == "cpu":
        side = (64, 64, 64)
        steps = 30
    else:
        side = (224, 224, 256)
        steps = 100

    fs = 3333.33
    dx = grid_spacing(340.0, 1.0 / fs)
    box = Box((0, 0, 0), (dx * (side[0] - 4), dx * (side[1] - 4),
                          dx * (side[2] - 4)))
    mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), dx, fs)
    desc = mesh.descriptor
    dims = desc.dimensions
    num_nodes = desc.num_nodes

    centre = tuple(np.asarray(box.centre()))
    src_loc = mesh.require_inside(centre)
    rcv_loc = mesh.require_inside(
        tuple(np.asarray(centre) + np.asarray([0.0, 0.0, dx * 4])))

    source = HardSource(
        node_idx=jnp.asarray(desc.flat_index(src_loc), dtype=jnp.int32),
        signal=impulse_signal(steps, 1.0))
    receiver = NodeReceiver(
        node_idx=jnp.asarray(desc.flat_index(rcv_loc), dtype=jnp.int32))

    # warmup + compile
    out = execute(mesh, source, receiver, steps)
    jax.block_until_ready(out["outputs"])

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = execute(mesh, source, receiver, steps)
        jax.block_until_ready(out["outputs"])
    dt = (time.perf_counter() - t0) / reps

    updates_per_s = num_nodes * steps / dt
    sol = HBM_BW[platform] / BYTES_PER_NODE
    print(json.dumps({
        "metric": "waveguide_node_updates_per_s_per_chip",
        "value": updates_per_s,
        "unit": "updates/s",
        "vs_baseline": updates_per_s / sol,
    }))


if __name__ == "__main__":
    main()
