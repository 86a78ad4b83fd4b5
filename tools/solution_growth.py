#!/usr/bin/env python
"""Solution-growth / artefact hunt (reference bin/solution_growth):
inject dirac and MLS signals as hard/soft sources into a small room and
check the solution decays rather than growing.  Prints one JSON line per
(signal, source-type) combination."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cutoff", type=float, default=500.0)
    ap.add_argument("--time", type=float, default=0.5)
    ap.add_argument("--absorption", type=float, default=0.1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from wayverb_tpu.core.environment import Environment
    from wayverb_tpu.core.geometry import Box
    from wayverb_tpu.core.kernels import generate_maximum_length_sequence
    from wayverb_tpu.waveguide import run as wgrun
    from wayverb_tpu.waveguide.descriptor import (
        compute_sampling_frequency, grid_spacing)
    from wayverb_tpu.waveguide.receivers import NodeReceiver
    from wayverb_tpu.waveguide.sources import (HardSource, SoftSource,
                                               impulse_signal)

    env = Environment()
    fs = compute_sampling_frequency(args.cutoff, 0.6)
    dx = grid_spacing(env.speed_of_sound, 1.0 / fs)
    box = Box((0, 0, 0), (5.56, 3.97, 2.81))
    mesh = wgrun.shoebox_mesh(box, np.full((1, 8), args.absorption), dx, fs)
    desc = mesh.descriptor
    num_steps = int(args.time * fs)

    src_idx = jnp.asarray(
        desc.flat_index(mesh.require_inside((2.0, 1.5, 1.0))),
        dtype=jnp.int32)
    rcv = NodeReceiver(node_idx=jnp.asarray(
        desc.flat_index(mesh.require_inside((3.5, 2.5, 1.8))),
        dtype=jnp.int32))

    mls = generate_maximum_length_sequence(12)[:num_steps] * 0.1
    signals = {
        "dirac": np.asarray(impulse_signal(num_steps, 1.0)),
        "mls": np.pad(mls, (0, max(0, num_steps - mls.size))),
    }

    ok = True
    for name, sig in signals.items():
        for kind, cls in (("hard", HardSource), ("soft", SoftSource)):
            src = cls(node_idx=src_idx, signal=jnp.asarray(sig))
            out = wgrun.execute(mesh, src, rcv, num_steps)
            p = np.asarray(out["outputs"])
            peak = float(np.abs(p).max())
            tail = float(np.abs(p[-num_steps // 10:]).max())
            grew = tail > peak or not bool(out["stable"])
            ok &= not grew
            print(json.dumps({
                "signal": name, "source": kind, "peak": peak,
                "tail_peak": tail, "tail_over_peak": tail / peak,
                "stable": bool(out["stable"]), "grew": grew}))
    print(json.dumps({"all_decaying": ok}))


if __name__ == "__main__":
    main()
