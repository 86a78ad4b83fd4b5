#!/usr/bin/env python
"""Hybrid level calibration check (reference bin/siltanen2013 +
bin/level_match): the calibrated waveguide's direct-wave level must match
the geometric solver's 1/r pressure at the same distance."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--distance", type=float, default=2.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from wayverb_tpu.core.environment import Environment
    from wayverb_tpu.core.geometry import Box
    from wayverb_tpu.signal.multiband import multiband_filter_and_mixdown
    from wayverb_tpu.waveguide import run as wgrun
    from wayverb_tpu.waveguide.descriptor import grid_spacing

    env = Environment()
    fs = 3333.33
    dx = grid_spacing(env.speed_of_sound, 1.0 / fs)
    d = args.distance

    # big box so the direct wave is clean before any reflection returns
    box = Box((0, 0, 0), (d + 6.0, 6.0, 6.2))
    mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.5), dx, fs)
    src = (3.0, 3.0, 3.1)
    rcv = (3.0 + d, 3.0, 3.1)
    sim_time = (d + 2.0) / env.speed_of_sound
    out = wgrun.canonical(mesh, src, rcv, sim_time, env)
    p = np.asarray(out.pressure)

    # compare amplitude SPECTRA in the valid band: the mesh disperses the
    # dirac, so the raw peak is meaningless, but in-band spectral level is
    # what the siltanen2013 calibration matches
    spec = np.abs(np.fft.rfft(p)) / 1.0  # unit-impulse input: |H| directly
    freqs = np.fft.rfftfreq(p.size, 1.0 / fs)
    expected = np.sqrt(env.acoustic_impedance / (4 * np.pi)) / d
    band = (freqs > 50.0) & (freqs < 0.2 * fs)
    measured = spec[band]
    ratio = measured / expected
    print(f"distance {d} m: in-band |P|/geometric ratio: "
          f"mean {ratio.mean():.3f}, spread "
          f"[{ratio.min():.3f}, {ratio.max():.3f}]")


if __name__ == "__main__":
    main()
