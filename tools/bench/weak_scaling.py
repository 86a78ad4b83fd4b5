"""Weak-scaling sweep of the sharded fused waveguide on virtual devices.

Constant PER-SHARD mesh block; the global grid grows with the shard count.
Prints one JSON line with three figures:

 * ``efficiency`` — t(1 shard) / t(n shards) wall-clock, the headline
   number.  CAVEAT: this host exposes N virtual devices over only
   ``os.cpu_count()`` physical cores (2 in this image), so even a program
   with ZERO collectives cannot scale past the core count — the ceiling
   is measured, not assumed, by the control below.
 * ``ctrl_efficiency`` — the same sweep for a COLLECTIVE-FREE control:
   n fully independent single-shard solvers dispatched concurrently on
   the n virtual devices.  This is the harness's perfect-parallelism
   ceiling for this program on this host.
 * ``efficiency_vs_ctrl`` — efficiency / ctrl_efficiency: the fraction
   attributable to the sharded solver itself (collectives + replicated
   work), with the host's core limit divided out.  This is the number
   that transfers to real ICI.

Also prints the per-step wire payload of the round-4 collective schedule
(ONE ppermute pair: field edge row + 4 plane-halo rows; ONE tiny psum
of the receiver tap values) against the round-3 schedule
(2 ppermutes + 2 psums incl. the full (6, Umax, Vmax) stacked planes).

Real multi-chip hardware is unavailable in this environment (a single
tunnelled v5e), so the sweep runs on a forced-multi-device CPU host: the
collective pattern and partitioned program are identical to the ICI path;
absolute times are CPU times.
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
STEPS = 100
REPS = 9
FS = 3333.33
DX = grid_spacing(340.0, 1.0 / FS)


def build(n_x):
    side = (XL * n_x, Y, Z)
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


def _time(fn):
    fn()                        # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_pair(n):
    """(t_sharded, t_ctrl) for n shards, with INTERLEAVED timing rounds:
    the ctrl is the identical partitioned program with ppermute/psum
    stubbed out (box_sharded fake_collectives) — the host's perfect-
    parallelism ceiling for exactly this program.  Interleaving cancels
    the 2-core host's minute-scale load drift, which otherwise dominates
    the sharded/ctrl ratio."""
    mesh, source, receiver = build(n)
    devmesh = ps.make_device_mesh(n)

    @jax.jit
    def sharded():
        out = bs.run_waveguide_box_sharded(
            devmesh, mesh.structure, mesh.box_spec, source, receiver,
            STEPS)
        return jnp.sum(out["outputs"] ** 2)

    @jax.jit
    def ctrl():
        out = bs.run_waveguide_box_sharded(
            devmesh, mesh.structure, mesh.box_spec, source, receiver,
            STEPS, fake_collectives=True)
        return jnp.sum(out["outputs"] ** 2)

    float(sharded())
    float(ctrl())
    ts, tc, ratios = [], [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(sharded())
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(ctrl())
        t_c = time.perf_counter() - t0
        ts.append(t_s)
        tc.append(t_c)
        ratios.append(t_c / t_s)   # paired: same scheduling weather
    return min(ts), min(tc), float(np.median(ratios))


def main():
    ns = [1]
    n = 2
    while n <= MAX_N:
        ns.append(n)
        n *= 2
    pairs = {n: time_pair(n) for n in ns}
    times = {n: p[0] for n, p in pairs.items()}
    ctrl = {n: p[1] for n, p in pairs.items()}
    ratio = {n: p[2] for n, p in pairs.items()}
    nmax = ns[-1]
    eff = times[ns[0]] / times[nmax]
    ctrl_eff = ctrl[ns[0]] / ctrl[nmax]
    # drift-robust collective efficiency: per-rep PAIRED ctrl/sharded
    # ratios share a scheduling window, so their medians cancel the
    # 2-core host's load swings that dominate min-of-runs comparisons
    vs_ctrl_paired = min(ratio[nmax] / ratio[ns[0]], 1.0)
    Vmax = max(Y, Z)
    Umax = max(XL * nmax, Y)
    wire = {
        "ppermute_bytes": 2 * (Y * Z + 4 * Vmax) * 4,
        "psum_bytes": 1 * 4,     # receiver tap values only (k floats)
        "collectives_per_step": 3,
        "r3_schedule_bytes": (2 * Y * Z + 6 * Umax * Vmax) * 4,
        "r3_collectives_per_step": 4,
        "at_224_cubed": {"ppermute_bytes": 2 * (224 * 256 + 4 * 256) * 4,
                         "psum_bytes": 7 * 4,
                         "r3_bytes": (2 * 224 * 256
                                      + 6 * 224 * 256) * 4},
    }
    # Auditable ICI projection at the production shape (224³ / 8 x-shards
    # / interior shards have TWO neighbours).  The CPU harness's vs_ctrl
    # reflects its ~0.3 ms software collectives, not this wire time.
    #
    #  * link model: each shard sends one (field row + 4 plane rows)
    #    payload to each x neighbour.  "serialized" charges BOTH
    #    directions to one 45 GB/s v5e ICI link (worst case);
    #    "full_duplex" charges one direction per link (v5e ICI links are
    #    full duplex and each neighbour has its own link — the realistic
    #    case for a 1-D ring layout).
    #  * compute rates: the sharded kernel is the STREAMING fused path
    #    (measured 3.62e10 upd/s/chip at 224³, BENCH r4); the mega-rate
    #    row shows the same arithmetic if the VMEM-resident kernel
    #    became the sharded kernel (5.39e10, r5).
    #  * overlap: since round 5 the bulk field kernel and plane update
    #    have NO data dependence on the exchange (box_sharded
    #    step_overlap); only the shard-edge skin (2 of xl field rows +
    #    2 plane rows, ratio 2/xl of the bulk) waits for the halos.
    #    step ≈ max(compute, wire) + skin  vs  compute + wire unoverlapped.
    one_dir_bytes = (224 * 256 + 4 * 256) * 4
    xl_224 = 224 // 8

    def project(rate, wire_bytes):
        compute_s = (224 * 224 * 256 / 8) / rate
        wire_s = wire_bytes / 45e9
        skin_s = (2.0 / xl_224) * compute_s
        return {
            "wire_s_per_step": wire_s,
            "compute_s_per_step_per_shard": compute_s,
            "efficiency_no_overlap": compute_s / (compute_s + wire_s),
            "efficiency_with_overlap": compute_s / (
                max(compute_s, wire_s) + skin_s),
            "skin_s_per_step": skin_s,
            "ici_link_gbps_assumed": 45,
        }

    wire["ici_projection_224_8shards"] = {
        "streaming_rate_serialized_link": project(3.62e10,
                                                  2 * one_dir_bytes),
        "streaming_rate_full_duplex": project(3.62e10, one_dir_bytes),
        "mega_rate_serialized_link": project(5.39e10, 2 * one_dir_bytes),
        "mega_rate_full_duplex": project(5.39e10, one_dir_bytes),
    }
    print(json.dumps({
        "efficiency": eff,
        "ctrl_efficiency": ctrl_eff,
        "efficiency_vs_ctrl": vs_ctrl_paired,
        "efficiency_vs_ctrl_minbased": min(eff / ctrl_eff, 1.0),
        "shards": ns,
        "step_times_s": {str(k): v / STEPS for k, v in times.items()},
        "ctrl_step_times_s": {str(k): v / STEPS for k, v in ctrl.items()},
        "per_shard_block": [XL, Y, Z],
        "steps": STEPS,
        "host_cores": os.cpu_count(),
        "wire_per_step": wire,
        "note": "virtual CPU devices over host_cores physical cores; "
                "identical collective pattern to ICI; ctrl = n "
                "independent collective-free solvers (the host's "
                "perfect-parallelism ceiling)",
    }))


if __name__ == "__main__":
    main()
