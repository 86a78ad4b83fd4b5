#!/usr/bin/env python
"""Wall reflectance measurement vs designed boundary filter (reference
bin/boundary_test + bin/fitted_boundary).  Prints a CSV of
frequency, measured |R|, predicted |R|."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--absorption", type=float, default=0.3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    sys.path.insert(0, "tests")
    from test_boundary_physics import FS, measure_wall_reflectance
    from wayverb_tpu.signal.iir_design import frequency_response
    from wayverb_tpu.waveguide import boundary as bdry

    freqs, measured, good = measure_wall_reflectance(args.absorption)
    coeffs = bdry.compute_reflectance_filter_coefficients(
        np.full(8, args.absorption), FS)
    predicted = np.abs(frequency_response(coeffs.b, coeffs.a,
                                          freqs / (FS / 2)))
    print("freq_hz,measured,predicted,valid")
    for f, m, p, g in zip(freqs, measured, predicted, good):
        print(f"{f:.1f},{m:.4f},{p:.4f},{int(g)}")


if __name__ == "__main__":
    main()
