#!/usr/bin/env python
"""Bake an HRTF energy table from a directory of HRIR WAV files.

Equivalent of the reference's ``src/hrtf/cmd`` codegen: each WAV holds one
direction's stereo impulse response, named ``azel_az_<deg>_el_<deg>.wav``
(any text around the two numbers works — the first two signed integers in
the filename are taken as azimuth and elevation in degrees).  Produces an
``.npz`` with the (az_bins, el_bins, 2, 8) energy table consumed by
``wayverb_tpu.core.hrtf.table_from_energies``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import os
import re

import numpy as np


def bake(hrir_dir: str, out: str, az_bins: int = 24, el_bins: int = 9,
         verbose: bool = True) -> np.ndarray:
    """Bake the (az_bins, el_bins, 2, 8) energy table; writes ``out`` .npz
    and returns the table."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from wayverb_tpu.signal.multiband import per_band_energy
    from wayverb_tpu.utils.audio import read_wav

    table = np.zeros((az_bins, el_bins, 2, 8))
    counts = np.zeros((az_bins, el_bins))

    listen_re = re.compile(r".*R([0-9]+)_T([0-9]+)_P([0-9]+).*")
    for name in sorted(os.listdir(hrir_dir)):
        if not name.lower().endswith(".wav"):
            continue
        m = listen_re.match(name)
        if m:
            # IRCAM Listen naming (the set the reference bakes,
            # src/core/src/attenuator/hrtf.cpp:68-85): R radius (cm,
            # unused), T azimuth deg, P elevation deg with negative
            # elevations wrapped above 180 (P315 = −45°)
            az_deg = float(m.group(2))
            el_deg = float(m.group(3))
            if el_deg > 180.0:
                el_deg -= 360.0
        else:
            nums = re.findall(r"-?\d+", name)
            if len(nums) < 2:
                if verbose:
                    print(f"skipping {name}: no az/el in filename")
                continue
            az_deg, el_deg = float(nums[0]), float(nums[1])
        data, sr = read_wav(os.path.join(hrir_dir, name))
        if data.shape[0] < 2:
            data = np.vstack([data, data])
        az_bin = int(round(az_deg / 360.0 * az_bins)) % az_bins
        el_bin = int(np.clip(round(el_deg / 180.0 * el_bins)
                             + el_bins // 2, 0, el_bins - 1))
        for ch in range(2):
            energy = np.asarray(per_band_energy(
                jnp.asarray(data[ch], dtype=jnp.float32), sr))
            table[az_bin, el_bin, ch] += energy
        counts[az_bin, el_bin] += 1

    filled = counts > 0
    table[filled] /= counts[filled][:, None, None]
    if verbose:
        print(f"baked {int(filled.sum())}/{filled.size} direction bins")
    np.savez(out, table=table)
    if verbose:
        print("wrote", out)
    return table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hrir_dir")
    ap.add_argument("out", help="output .npz path")
    ap.add_argument("--az-bins", type=int, default=24)
    ap.add_argument("--el-bins", type=int, default=9)
    args = ap.parse_args()
    bake(args.hrir_dir, args.out, args.az_bins, args.el_bins)


if __name__ == "__main__":
    main()
