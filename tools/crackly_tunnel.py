#!/usr/bin/env python
"""Crackle artefact hunt (reference bin/crackly_tunnel): full hybrid render
in a long tunnel — the geometry that historically provoked crackle in the
stochastic tail — written to WAV for listening, plus a crackle statistic
(max sample-to-sample jump relative to the local envelope)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--length", type=float, default=30.0)
    ap.add_argument("--rays", type=int, default=1 << 14)
    ap.add_argument("--cutoff", type=float, default=400.0)
    ap.add_argument("--output-rate", type=float, default=16000.0)
    ap.add_argument("--out", default="/tmp/crackly_tunnel.wav")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np
    from wayverb_tpu.combined import engine as ce
    from wayverb_tpu.core.attenuator import Null
    from wayverb_tpu.core.geometry import Box, box_scene
    from wayverb_tpu.core.surfaces import Surface
    from wayverb_tpu.utils.audio import write_wav

    box = Box((0, 0, 0), (2.5, 2.5, args.length))
    soup = box_scene(box)
    surfaces = Surface(absorption=np.full((1, 8), 0.1),
                       scattering=np.full((1, 8), 0.1))

    eng = ce.Engine(soup, surfaces,
                    ce.WaveguideParameters(cutoff=args.cutoff),
                    scene_box=box)
    results = eng.run((1.2, 1.2, 2.0), (1.2, 1.2, args.length - 4.0),
                      jax.random.PRNGKey(7),
                      ce.RaytracerParameters(rays=args.rays))
    ir = np.asarray(ce.render(results, Null(), args.output_rate,
                              jax.random.PRNGKey(8)))
    ir = ir / max(np.abs(ir).max(), 1e-12)
    write_wav(args.out, ir, args.output_rate)

    # crackle statistic: largest first-difference vs the local RMS envelope
    diff = np.abs(np.diff(ir))
    win = max(int(args.output_rate * 0.01), 1)
    kernel = np.ones(win) / win
    envelope = np.sqrt(np.convolve(ir ** 2, kernel, mode="same") + 1e-20)
    crackle = diff / np.maximum(envelope[1:], 1e-10)
    print(json.dumps({
        "wrote": args.out,
        "ir_seconds": ir.size / args.output_rate,
        "max_jump_over_envelope": float(crackle.max()),
        "p999_jump_over_envelope": float(np.quantile(crackle, 0.999))}))


if __name__ == "__main__":
    main()
