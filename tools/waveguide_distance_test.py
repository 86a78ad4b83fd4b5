#!/usr/bin/env python
"""1/r pressure decay of the waveguide mesh (reference
bin/waveguide_distance_test probes mesh propagation with a line of
receivers).  Default mode: free field — a cube large enough that each
receiver's direct arrival is windowed off before the first wall
reflection, so peak |p|·r should be constant.  ``--duct`` reproduces the
reference's 1×1×12 m reflective duct (guided wave, for inspection only).
Prints CSV distance_m, peak, peak·r."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sample-rate", type=float, default=5000.0)
    ap.add_argument("--max-distance", type=float, default=4.0)
    ap.add_argument("--duct", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from wayverb_tpu.core.environment import Environment
    from wayverb_tpu.core.geometry import Box
    from wayverb_tpu.waveguide import run as wgrun
    from wayverb_tpu.waveguide.descriptor import grid_spacing
    from wayverb_tpu.waveguide.receivers import MultiNodeReceiver
    from wayverb_tpu.waveguide.sources import (HardSource, impulse_signal,
                                               rectilinear_calibration_factor)

    env = Environment()
    c = env.speed_of_sound
    fs = args.sample_rate
    dx = grid_spacing(env.speed_of_sound, 1.0 / fs)

    if args.duct:
        box = Box((0, 0, 0), (1.0, 1.0, 12.0))
        source = np.array([0.5, 0.5, 0.5])
        distances = np.arange(1.0, 11.0)
        absorption = 0.0
        sim_time = 1.2 * 12.0 / c
    else:
        # cube with L > 2·max_d + clearance: direct arrival at distance d
        # can be windowed before the earliest reflection (path L − d)
        side = 2.0 * args.max_distance + 2.0
        box = Box((0, 0, 0), (side, side, side))
        source = np.full(3, side / 2)
        distances = np.arange(1.0, args.max_distance + 0.5)
        absorption = 0.5
        sim_time = (args.max_distance + 1.5) / c

    mesh = wgrun.shoebox_mesh(
        box, np.full((1, 8), max(absorption, 1e-3)), dx, fs)
    desc = mesh.descriptor
    src_loc = mesh.require_inside(tuple(source))
    rcv_locs = [mesh.require_inside(tuple(source + [0, 0, d]))
                for d in distances]
    rcv_idx = jnp.asarray([desc.flat_index(l) for l in rcv_locs],
                          dtype=jnp.int32)

    num_steps = int(sim_time * fs)
    amp = rectilinear_calibration_factor(desc.spacing,
                                         env.acoustic_impedance)
    src = HardSource(node_idx=jnp.asarray(desc.flat_index(src_loc),
                                          dtype=jnp.int32),
                     signal=impulse_signal(num_steps, amp))
    out = wgrun.execute(mesh, src, MultiNodeReceiver(rcv_idx), num_steps)
    traces = np.asarray(out["outputs"])          # (T, N)

    # true node distances (receivers snap to the grid)
    actual_d = np.array([np.linalg.norm(desc.position(l) - source)
                         for l in rcv_locs])
    peaks = []
    for i, d in enumerate(actual_d):
        if args.duct:
            window = traces[:, i]
        else:
            t_cut = int((d + 1.2) / c * fs)      # before first reflection
            window = traces[:t_cut, i]
        peaks.append(float(np.abs(window).max()))
    peaks = np.asarray(peaks)

    print("distance_m,peak,peak_times_r")
    for d, p in zip(actual_d, peaks):
        print(f"{d:.2f},{p:.6e},{p * d:.6e}")
    pr = peaks * actual_d
    print(json.dumps({"inv_r_spread": float(pr.max() / pr.min()),
                      "mode": "duct" if args.duct else "free_field",
                      "stable": bool(out["stable"])}))


if __name__ == "__main__":
    main()
