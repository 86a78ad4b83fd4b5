#!/usr/bin/env python
"""Shoebox early-IR comparison: traced+validated image sources vs the exact
lattice solver (reference bin/box)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 15)
    ap.add_argument("--max-order", type=int, default=3)
    ap.add_argument("--absorption", type=float, default=0.1)
    ap.add_argument("--sample-rate", type=float, default=16000.0)
    ap.add_argument("--out", default=None, help="write IR wav here")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from wayverb_tpu.core.attenuator import Null
    from wayverb_tpu.core.geometry import Box, box_scene
    from wayverb_tpu.core.impulse import apply_distance_pressure
    from wayverb_tpu.core.surfaces import Surface
    from wayverb_tpu.imagesource import exact
    from wayverb_tpu.imagesource.postprocess import postprocess
    from wayverb_tpu.imagesource.tree import find_image_source_impulses
    from wayverb_tpu.raytracer import tracer

    box = Box((0, 0, 0), (5.56, 3.97, 2.81))
    source, receiver = (2.09, 2.12, 2.12), (2.09, 3.08, 0.96)
    soup = box_scene(box)
    surf = Surface(absorption=jnp.full((1, 8), args.absorption),
                   scattering=jnp.zeros((1, 8)))

    res = tracer.trace_jit(soup, surf, source, receiver,
                           jax.random.PRNGKey(0), num_rays=args.rays,
                           depth=args.max_order + 1, max_time=0.5)
    found = find_image_source_impulses(
        res.triangle_history, soup, surf, source, receiver, args.max_order)
    oracle = exact.find_impulses(box, source, receiver,
                                 jnp.full(8, args.absorption), 25.0)

    f_d = np.sort(np.asarray(found.distance))
    o_d = np.asarray(oracle.distance)[np.asarray(oracle.volume[:, 0]) != 0]
    matched = sum(1 for d in f_d if np.min(np.abs(o_d - d)) < 1e-3)
    print(f"traced paths: {len(f_d)}  matched to exact lattice: {matched}")

    both = found.concatenate(exact.get_direct(source, receiver, soup))
    ir = postprocess(apply_distance_pressure(both, 400.0), Null(), receiver,
                     340.0, args.sample_rate)
    print(f"IR: {ir.shape[-1]} samples, peak {float(jnp.abs(ir).max()):.4f}")
    if args.out:
        from wayverb_tpu.utils.audio import write_wav
        write_wav(args.out, np.asarray(ir), args.sample_rate)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
