#!/usr/bin/env python
"""PCS source experiment (reference bin/sheaffer2014, replicating
sheaffer2014 §V-A): inject a physically-constrained source — maxflat FIR
pulse shaped by the pulsating-sphere mechanical filter and the injection
filter — as a soft source in a large room, record the pressure at 1 m, and
write the pulse + response to WAV.  The PCS pulse must be DC-free and the
response must stay bounded (no solution growth from the source)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cutoff", type=float, default=500.0)
    ap.add_argument("--time", type=float, default=0.2)
    ap.add_argument("--mass", type=float, default=0.025)
    ap.add_argument("--low-cutoff-hz", type=float, default=100.0)
    ap.add_argument("--low-q", type=float, default=0.7)
    ap.add_argument("--out-prefix", default="/tmp/sheaffer2014")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from wayverb_tpu.core.environment import Environment
    from wayverb_tpu.core.geometry import Box
    from wayverb_tpu.utils.audio import write_wav
    from wayverb_tpu.waveguide import run as wgrun
    from wayverb_tpu.waveguide.descriptor import (
        compute_sampling_frequency, grid_spacing)
    from wayverb_tpu.waveguide.excitation import design_pcs_source
    from wayverb_tpu.waveguide.receivers import NodeReceiver
    from wayverb_tpu.waveguide.sources import SoftSource

    env = Environment()
    fs = compute_sampling_frequency(args.cutoff, 0.6)
    dx = grid_spacing(env.speed_of_sound, 1.0 / fs)
    box = Box((0, 0, 0), (6.0, 6.0, 6.0))
    mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.3), dx, fs)
    desc = mesh.descriptor

    num_steps = int(args.time * fs)
    pulse, offset = design_pcs_source(
        num_steps, env.acoustic_impedance, env.speed_of_sound, fs,
        radius=desc.spacing * 0.5, sphere_mass=args.mass,
        low_cutoff_hz=args.low_cutoff_hz, low_q=args.low_q)

    src = SoftSource(
        node_idx=jnp.asarray(
            desc.flat_index(mesh.require_inside((3.0, 3.0, 3.0))),
            dtype=jnp.int32),
        signal=jnp.asarray(pulse))
    rcv = NodeReceiver(node_idx=jnp.asarray(
        desc.flat_index(mesh.require_inside((3.0, 3.0, 4.0))),
        dtype=jnp.int32))
    out = wgrun.execute(mesh, src, rcv, num_steps)
    response = np.asarray(out["outputs"])

    write_wav(f"{args.out_prefix}.pulse.wav",
              pulse / max(np.abs(pulse).max(), 1e-12), fs)
    write_wav(f"{args.out_prefix}.response.wav",
              response / max(np.abs(response).max(), 1e-12), fs)

    spec = np.abs(np.fft.rfft(pulse))
    print(json.dumps({
        "sample_rate_hz": fs,
        "pulse_offset_samples": offset,
        "pulse_dc_over_peak": float(spec[0] / spec.max()),
        "response_peak": float(np.abs(response).max()),
        "response_tail_over_peak": float(
            np.abs(response[-num_steps // 10:]).max()
            / np.abs(response).max()),
        "stable": bool(out["stable"]),
        "wrote": [f"{args.out_prefix}.pulse.wav",
                  f"{args.out_prefix}.response.wav"]}))


if __name__ == "__main__":
    main()
