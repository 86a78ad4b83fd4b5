"""Weak-scaling sweep of the sharded fused waveguide on virtual devices.

Constant PER-SHARD mesh block; the global grid grows with the shard count.
Efficiency = t(1 shard) / t(n shards); the overhead measured is the
per-step halo ppermute + inner-plane psum of parallel.box_sharded.

Real multi-chip hardware is unavailable in this environment (a single
tunnelled v5e), so the sweep runs on a forced-multi-device CPU host: the
collective pattern and partitioned program are identical to the ICI path;
absolute times are CPU times.  Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

MAX_N = int(os.environ.get("WEAK_SCALING_MAX_N", "8"))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count="
                             f"{MAX_N}").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from wayverb_tpu.core.geometry import Box, box_scene  # noqa: E402
from wayverb_tpu.parallel import box_sharded as bs  # noqa: E402
from wayverb_tpu.parallel import sharding as ps  # noqa: E402
from wayverb_tpu.waveguide import run as wgrun  # noqa: E402
from wayverb_tpu.waveguide.descriptor import grid_spacing  # noqa: E402
from wayverb_tpu.waveguide.receivers import NodeReceiver  # noqa: E402
from wayverb_tpu.waveguide.sources import (HardSource,  # noqa: E402
                                           impulse_signal)

XL, Y, Z = 16, 48, 128         # per-shard block
STEPS = 30
FS = 3333.33
DX = grid_spacing(340.0, 1.0 / FS)


def build(n):
    side = (XL * n, Y, Z)
    box = Box((0, 0, 0), (DX * (side[0] - 4), DX * (side[1] - 4),
                          DX * (side[2] - 4)))
    mesh = wgrun.compute_mesh(box_scene(box), np.full((1, 8), 0.1), DX, FS,
                              scene_box=box, align=tuple(side))
    assert mesh.descriptor.dimensions == side, mesh.descriptor.dimensions
    desc = mesh.descriptor
    src = mesh.require_inside(tuple(np.asarray(box.centre())))
    source = HardSource(
        node_idx=jnp.asarray(desc.flat_index(src), dtype=jnp.int32),
        signal=impulse_signal(STEPS, 1.0))
    receiver = NodeReceiver(node_idx=jnp.asarray(
        desc.flat_index(src) + 2, dtype=jnp.int32))
    return mesh, source, receiver


def time_n(n):
    mesh, source, receiver = build(n)
    devmesh = ps.make_device_mesh(n)

    def run():
        out = bs.run_waveguide_box_sharded(
            devmesh, mesh.structure, mesh.box_spec, source, receiver,
            STEPS)
        return float(jnp.sum(out["outputs"] ** 2))

    run()                       # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ns = [1]
    n = 2
    while n <= MAX_N:
        ns.append(n)
        n *= 2
    times = {n: time_n(n) for n in ns}
    t1 = times[ns[0]]
    eff = t1 / times[ns[-1]]
    print(json.dumps({
        "efficiency": eff,
        "shards": ns,
        "step_times_s": {str(k): v / STEPS for k, v in times.items()},
        "per_shard_block": [XL, Y, Z],
        "steps": STEPS,
        "note": "virtual CPU devices; identical collective pattern to ICI",
    }))


if __name__ == "__main__":
    main()
