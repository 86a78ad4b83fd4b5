#!/usr/bin/env python
"""Boundary-filter fit quality sweep: every preset material × mesh rate.

The ``bin/fitted_boundary`` analogue with a COMMITTED output: for all
material presets (combined/model.py, vorlander2007 table) at three
waveguide mesh rates, fit the order-6 impedance boundary filter
(waveguide/boundary.py: eqnerror + cepstral min-phase + Schur + passivity
guard — the repo's replacement for the reference's zero-pinned yulewalk,
``arbitrary_magnitude_filter.h:63-95``) and record

 * the worst in-band |R| error vs the target per-band reflectance, and
 * the global reflectance maximum over a dense frequency sweep (passivity:
   must stay ≤ 1).

Run:  python tools/boundary_fit_sweep.py [--json BOUNDARY_FIT_r04.json]
The committed JSON is pinned by tests/test_artifacts.py.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

MESH_RATES = [2000.0, 3333.33, 6666.67]   # waveguide cutoffs 300–1000 Hz


def main(json_path=None):
    from wayverb_tpu.combined.model import MATERIAL_PRESETS
    from wayverb_tpu.signal.multiband import band_centres
    from wayverb_tpu.waveguide import boundary as bdry

    rows = []
    for preset in MATERIAL_PRESETS:
        absorption = np.asarray(preset.absorption, dtype=np.float64)
        target_r = np.sqrt(np.clip(1.0 - absorption, 0.0, 1.0))
        for fs in MESH_RATES:
            coeffs = bdry.compute_boundary_coefficients(absorption, fs)
            centres = np.asarray(band_centres(absorption.shape[0]))
            nyq = fs / 2.0
            in_band = centres < nyq * 0.9
            freqs = centres[in_band] / nyq
            got_r = bdry.reflectance_response(coeffs, freqs)
            err = float(np.max(np.abs(got_r - target_r[in_band])))
            dense = np.linspace(1e-3, 0.999, 512)
            max_r = float(np.max(bdry.reflectance_response(coeffs, dense)))
            rows.append({
                "material": preset.name, "mesh_rate_hz": fs,
                "bands_in_range": int(in_band.sum()),
                "max_inband_r_error": err,
                "max_reflectance": max_r,
            })

    worst_err = max(r["max_inband_r_error"] for r in rows)
    worst_r = max(r["max_reflectance"] for r in rows)
    summary = {
        "materials": len(MATERIAL_PRESETS),
        "mesh_rates": MESH_RATES,
        "worst_inband_r_error": worst_err,
        "worst_reflectance": worst_r,
        "error_bound": 0.02,
        "passivity_bound": 1.0,
        "rows": rows,
    }
    print(f"{len(rows)} fits: worst in-band |R| error {worst_err:.4f}, "
          f"global max |R| {worst_r:.6f}")
    assert worst_r <= 1.0 + 1e-6, "passivity violated"
    assert worst_err <= summary["error_bound"], "fit error beyond bound (0.02)"
    if json_path:
        json.dump(summary, open(json_path, "w"), indent=1)
        print("wrote", json_path)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", type=str, default=None)
    a = ap.parse_args()
    main(a.json)
