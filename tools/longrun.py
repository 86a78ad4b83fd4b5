#!/usr/bin/env python
"""Long-run stability validation (the ``nan_in_waveguide.cpp`` analogue).

Two modes:
  --mode hw   : >=10^4 steps at the production bench shape on the real
                chip; asserts the run stays stable (finite boundary planes
                every step + finite full field at the end) and prints tail
                statistics.
  --mode f64  : 10^4-step f32-field run with f32 vs f64 IIR filter state on
                CPU (x64 enabled); prints the receiver-trace drift — the
                empirical check behind shipping f32 state by default where
                the reference mandates double (cl/filter_structs.h:14).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(side, steps, absorption=0.08):
    import jax.numpy as jnp
    from wayverb_tpu.core.geometry import Box
    from wayverb_tpu.waveguide import run as wgrun
    from wayverb_tpu.waveguide.descriptor import grid_spacing
    from wayverb_tpu.waveguide.receivers import NodeReceiver
    from wayverb_tpu.waveguide.sources import (HardSource, impulse_signal,
                                               rectilinear_calibration_factor)

    fs = 3333.33
    dx = grid_spacing(340.0, 1.0 / fs)
    box = Box((0, 0, 0), (dx * (side[0] - 4), dx * (side[1] - 4),
                          dx * (side[2] - 4)))
    mesh = wgrun.shoebox_mesh(box, np.full((1, 8), absorption), dx, fs)
    desc = mesh.descriptor
    centre = tuple(np.asarray(box.centre()))
    src = mesh.require_inside(centre)
    rcv = mesh.require_inside(
        tuple(np.asarray(centre) + np.asarray([0.0, 0.0, dx * 6])))
    amp = rectilinear_calibration_factor(dx, 400.0)
    source = HardSource(
        node_idx=jnp.asarray(desc.flat_index(src), dtype=jnp.int32),
        signal=impulse_signal(steps, amp))
    receiver = NodeReceiver(
        node_idx=jnp.asarray(desc.flat_index(rcv), dtype=jnp.int32))
    return mesh, source, receiver


def mode_hw(steps):
    import jax
    import jax.numpy as jnp
    from wayverb_tpu.waveguide.run import run_waveguide_box

    mesh, source, receiver = build((224, 224, 256), steps)

    @jax.jit
    def run():
        out = run_waveguide_box(mesh.structure, mesh.box_spec, source,
                                receiver, steps)
        p = out["outputs"]
        return (out["stable"].astype(jnp.float32), jnp.max(jnp.abs(p)),
                jnp.max(jnp.abs(p[-steps // 10:])), jnp.sum(p ** 2))

    t0 = time.time()
    stable, peak, tail_peak, energy = [float(v) for v in run()]
    dt = time.time() - t0
    print(f"steps={steps} wall={dt:.1f}s stable={stable} peak={peak:.4e} "
          f"tail_peak={tail_peak:.4e} energy={energy:.4e}")
    assert stable == 1.0, "long run went unstable"
    assert tail_peak < peak, "no decay?"
    print("LONGRUN_HW_PASS")
    return {"mode": "hw", "steps": steps, "shape": [224, 224, 256],
            "wall_s": dt, "stable": stable, "peak": peak,
            "tail_peak": tail_peak, "energy": energy}


def mode_f64(steps):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from wayverb_tpu.waveguide.run import run_waveguide_box

    mesh, source, receiver = build((32, 32, 128), steps, absorption=0.05)

    o32 = run_waveguide_box(mesh.structure, mesh.box_spec, source,
                            receiver, steps)
    o64 = run_waveguide_box(mesh.structure, mesh.box_spec, source,
                            receiver, steps, state_dtype=jnp.float64)
    p32 = np.asarray(o32["outputs"])
    p64 = np.asarray(o64["outputs"])
    scale = np.abs(p64).max()
    drift = np.abs(p32 - p64).max()
    print(f"steps={steps} stable32={bool(o32['stable'])} "
          f"stable64={bool(o64['stable'])} peak={scale:.4e} "
          f"max_drift={drift:.4e} rel={drift/scale:.2e}")
    assert bool(o32["stable"]) and bool(o64["stable"])
    assert drift / scale < 2e-3, "f32 filter state drifted beyond bound"
    print("LONGRUN_F64_PASS")
    return {"mode": "f64", "steps": steps, "shape": [32, 32, 128],
            "peak": float(scale), "max_drift": float(drift),
            "rel_drift": float(drift / scale),
            "bound": 2e-3}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["hw", "f64"], default="hw")
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--json", type=str, default=None,
                    help="append the result record to this JSON file")
    args = ap.parse_args()
    rec = mode_hw(args.steps) if args.mode == "hw" else \
        mode_f64(args.steps)
    if args.json:
        data = []
        if os.path.exists(args.json):
            data = json.load(open(args.json))
        data = [d for d in data if d.get("mode") != rec["mode"]]
        data.append(rec)
        json.dump(data, open(args.json, "w"), indent=1)
