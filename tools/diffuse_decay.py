#!/usr/bin/env python
"""Decay-smoothness of the stochastic tail (reference bin/diffuse_decay):
trace a diffuse room, Schroeder-integrate the energy histogram per band and
fit a line — the residual from linearity measures how smooth/crackle-free
the decay is.  Prints per-band JSON lines."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 16)
    ap.add_argument("--absorption", type=float, default=0.1)
    ap.add_argument("--scattering", type=float, default=0.1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np
    from wayverb_tpu.core.environment import Environment
    from wayverb_tpu.core.geometry import Box, box_scene
    from wayverb_tpu.core.reverb import sabine_reverb_time
    from wayverb_tpu.core.surfaces import Surface
    from wayverb_tpu.raytracer import tracer
    from wayverb_tpu.signal.filters import linear_regression

    env = Environment()
    dims = np.array([5.56, 3.97, 2.81])
    box = Box((0, 0, 0), tuple(dims))
    soup = box_scene(box)
    surfaces = Surface(
        absorption=np.full((1, 8), args.absorption),
        scattering=np.full((1, 8), args.scattering))

    volume = float(np.prod(dims))
    area = float(2 * (dims[0] * dims[1] + dims[1] * dims[2]
                      + dims[0] * dims[2]))
    sabine = 0.161 * volume / (area * args.absorption)
    depth = tracer.compute_optimum_reflection_number(args.absorption)

    res = tracer.trace_jit(
        soup, surfaces, (2.0, 1.5, 1.0), (3.5, 2.5, 1.8),
        jax.random.PRNGKey(0), num_rays=args.rays, depth=depth,
        max_time=1.5 * sabine, environment=env)
    hist = np.asarray(res.summed_histogram())      # (bins, bands)
    sr = res.histogram_sample_rate

    print(json.dumps({"sabine_t60_s": sabine, "depth": depth,
                      "rays": args.rays}))
    for b in range(hist.shape[1]):
        energy = hist[:, b]
        # Schroeder backward integral of energy, in dB
        sch = np.cumsum(energy[::-1])[::-1]
        sch = sch / max(sch[0], 1e-30)
        db = 10.0 * np.log10(np.maximum(sch, 1e-30))
        # fit over the -5..-35 dB stretch
        sel = (db <= -5.0) & (db >= -35.0)
        t = np.arange(db.size)[sel] / sr
        import jax.numpy as jnp
        slope, intercept = linear_regression(jnp.asarray(t),
                                             jnp.asarray(db[sel]))
        slope, intercept = float(slope), float(intercept)
        fitted = slope * t + intercept
        rms_dev_db = float(np.sqrt(np.mean((db[sel] - fitted) ** 2)))
        t30 = -60.0 / slope if slope < 0 else float("inf")
        print(json.dumps({
            "band": b, "t30_s": t30,
            "t30_vs_sabine_percent": (t30 - sabine) / sabine * 100.0,
            "decay_rms_deviation_db": rms_dev_db}))


if __name__ == "__main__":
    main()
