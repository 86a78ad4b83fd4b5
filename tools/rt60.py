#!/usr/bin/env python
"""Measured vs Sabine reverb time for three shoebox rooms (reference
bin/rt60: waveguide-only decays at absorption 0.1)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--absorption", type=float, default=0.1)
    ap.add_argument("--cutoff", type=float, default=500.0)
    ap.add_argument("--usable-portion", type=float, default=0.6)
    ap.add_argument("--time", type=float, default=2.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from wayverb_tpu.core.environment import Environment
    from wayverb_tpu.core.geometry import Box
    from wayverb_tpu.signal.filters import decay_time
    from wayverb_tpu.waveguide import run as wgrun
    from wayverb_tpu.waveguide.descriptor import (
        compute_sampling_frequency, grid_spacing)

    env = Environment()
    fs = compute_sampling_frequency(args.cutoff, args.usable_portion)
    dx = grid_spacing(env.speed_of_sound, 1.0 / fs)

    rooms = {
        "small": (2.0, 2.5, 3.0),
        "medium": (4.5, 2.5, 3.5),
        "large": (12.0, 4.0, 8.0),
    }
    report = {}
    for name, dims in rooms.items():
        dims = np.asarray(dims)
        box = Box((0, 0, 0), tuple(dims))
        vol = float(np.prod(dims))
        area = float(2 * (dims[0] * dims[1] + dims[1] * dims[2]
                          + dims[0] * dims[2]))
        sabine = 0.161 * vol / (area * args.absorption)
        mesh = wgrun.shoebox_mesh(
            box, np.full((1, 8), args.absorption), dx, fs)
        out = wgrun.canonical(mesh, tuple(dims * 0.35), tuple(dims * 0.65),
                              args.time, env)
        t30 = float(decay_time(jnp.asarray(np.asarray(out.pressure)),
                               out.sample_rate, -5, -35))
        report[name] = {
            "sabine_s": sabine,
            "measured_t30_s": t30,
            "error_percent": (t30 - sabine) / sabine * 100.0,
            "stable": bool(out.stable),
        }
        print(f"{name}: sabine {sabine:.3f}s measured {t30:.3f}s "
              f"({report[name]['error_percent']:+.1f}%)")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
