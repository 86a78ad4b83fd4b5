"""Waveguide↔geometric level calibration (reference bin/siltanen2013,
bin/level_match): the calibrated hard-source waveguide's in-band direct
spectral level must land at the geometric √(Z/4π)/d level (broadband
average — the 0.3405 constant is siltanen2013's empirical broadband
match; mesh dispersion and residual wall interference ripple the curve)."""

import numpy as np
import jax

from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.descriptor import grid_spacing

ENV = Environment()
FS = 3333.33
DX = grid_spacing(ENV.speed_of_sound, 1.0 / FS)


def test_direct_level_matches_geometric():
    d = 2.0
    box = Box((0, 0, 0), (12.0, 10.0, 10.2))
    mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.95), DX, FS)
    out = wgrun.canonical(mesh, (5.0, 5.0, 5.1), (5.0 + d, 5.0, 5.1),
                          0.08, ENV)
    p = np.asarray(out.pressure)
    spec = np.abs(np.fft.rfft(p))
    freqs = np.fft.rfftfreq(p.size, 1.0 / FS)
    expected = np.sqrt(ENV.acoustic_impedance / (4 * np.pi)) / d
    band = (freqs > 50.0) & (freqs < 0.2 * FS)
    ratio = spec[band] / expected
    assert 0.5 < ratio.mean() < 1.2, ratio.mean()
    # every in-band bin is the right order of magnitude
    assert ratio.min() > 0.15 and ratio.max() < 2.0
