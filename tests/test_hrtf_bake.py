"""HRIR → energy-table bake pipeline (tools/bake_hrtf.py, the analogue of
the reference's src/hrtf/cmd codegen) run on a synthesized measured-style
HRIR set, with ILD/ITD sign checks on the result."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from wayverb_tpu.core.attenuator import Hrtf
from wayverb_tpu.core.hrtf import table_from_energies
from wayverb_tpu.utils.audio import write_wav

SR = 44100.0


def synth_hrir_set(directory):
    """Stereo HRIRs over a coarse az/el grid with physical ILD (right ear
    louder for sources on the right) and ITD (right ear earlier)."""
    half_head_s = 0.0009            # ~0.31 m path difference at extremes
    for az in range(0, 360, 30):
        for el in (-40, 0, 40):
            rad = np.radians(az)
            lateral = np.sin(rad) * np.cos(np.radians(el))  # +1 = right
            n = 512
            ir = np.zeros((2, n), np.float64)
            for ch, side in ((0, -1.0), (1, 1.0)):
                gain = 1.0 + 0.6 * lateral * side           # ILD
                delay_s = half_head_s * (1.0 - lateral * side) / 2  # ITD
                k = int(round(delay_s * SR)) + 8
                ir[ch, k] = gain
                ir[ch, k + 1] = 0.3 * gain                  # small tail
            write_wav(os.path.join(directory,
                                   f"azel_az_{az}_el_{el}.wav"), ir, SR)


@pytest.fixture(scope="module")
def baked(tmp_path_factory):
    from bake_hrtf import bake
    d = tmp_path_factory.mktemp("hrirs")
    synth_hrir_set(str(d))
    out = str(d / "table.npz")
    table = bake(str(d), out, verbose=False)
    return table, out


class TestBake:
    def test_coverage_and_shape(self, baked):
        table, out = baked
        assert table.shape == (24, 9, 2, 8)
        data = np.load(out)["table"]
        np.testing.assert_array_equal(data, table)
        # 12 azimuths × 3 elevations of coverage
        filled = table.sum(axis=(2, 3)) > 0
        assert filled.sum() == 12 * 3

    def test_ild_sign(self, baked):
        """Source on the right (az 90°) → right-ear energy greater, and
        vice versa; energy is delay-invariant (ITD must not leak in)."""
        table, _ = baked
        az90 = int(round(90 / 360 * 24))       # bin 6
        az270 = int(round(270 / 360 * 24))
        mid = 9 // 2
        right, left = table[az90, mid, 1], table[az90, mid, 0]
        assert np.all(right > left)
        right2, left2 = table[az270, mid, 1], table[az270, mid, 0]
        assert np.all(left2 > right2)
        # frontal source: symmetric ears
        f = table[0, mid]
        np.testing.assert_allclose(f[0], f[1], rtol=1e-5)

    def test_attenuator_consumes_baked_table(self, baked):
        table, _ = baked
        t = table_from_energies(table)
        right_ear = Hrtf(channel=1, table=t)
        left_ear = Hrtf(channel=0, table=t)
        # incident vector pointing right (+x in head coordinates)
        inc = jnp.asarray([[1.0, 0.0, 0.0]])
        g_r = np.asarray(right_ear.attenuation(inc))[0]
        g_l = np.asarray(left_ear.attenuation(inc))[0]
        assert np.all(g_r > g_l)

    def test_itd_ear_positions(self):
        """ITD arises from ear offsets: right ear displaced +x, left −x,
        giving the right ear the shorter path for right-side sources."""
        right_ear = Hrtf(channel=1, radius=0.1)
        left_ear = Hrtf(channel=0, radius=0.1)
        base = jnp.zeros(3)
        pr = np.asarray(right_ear.ear_position(base))
        pl = np.asarray(left_ear.ear_position(base))
        src = np.asarray([2.0, 0.0, 0.0])     # on the right
        assert np.linalg.norm(src - pr) < np.linalg.norm(src - pl)


class TestListenNaming:
    def test_listen_convention_parsed(self, tmp_path):
        """IRCAM Listen-named files (IRC_*_R0195_T030_P315.wav) must land
        in the right az/el bins — the measured-table interface the
        reference bakes (src/core/src/attenuator/hrtf.cpp:68-85).  P
        above 180 wraps to negative elevation (P315 = −45°)."""
        from bake_hrtf import bake
        d = tmp_path / "listen"
        d.mkdir()
        n = 256
        for az, el_p in ((30, 45), (330, 315), (0, 0)):
            ir = np.zeros((2, n))
            lateral = np.sin(np.radians(az))
            for ch, side in ((0, -1.0), (1, 1.0)):
                ir[ch, 8] = 1.0 + 0.6 * lateral * side
            write_wav(str(d / f"IRC_1002_C_R0195_T{az:03d}_P{el_p:03d}"
                          ".wav"), ir, SR)
        table = bake(str(d), str(d / "t.npz"), az_bins=12, el_bins=9,
                     verbose=False)
        # az 30° → bin 1 of 12; el +45° → above-centre bin; el −45° (P315)
        # → below-centre bin
        assert table[1, 9 // 2 + 2].sum() > 0        # T030_P045
        assert table[11, 9 // 2 - 2].sum() > 0       # T330_P315
        assert table[0, 9 // 2].sum() > 0            # T000_P000
        # ILD sign: right-of-head source louder in right ear
        az30 = table[1, 9 // 2 + 2]
        assert az30[1].sum() > az30[0].sum()
