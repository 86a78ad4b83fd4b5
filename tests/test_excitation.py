"""Transparent-source and PCS excitation tests — mirrors the reference's
verify_compensation_signal.cpp and pcs.cpp tests."""

import numpy as np
import pytest

from wayverb_tpu.waveguide import excitation as exc


class TestMeshImpulseResponse:
    def test_layout_matches_reference_tool(self):
        """[0, h1, h2, ...] — instantaneous sample excluded."""
        ir = exc.mesh_impulse_response(32)
        assert ir[0] == 0.0
        # the mesh rings after the impulse (dispersive lattice)
        assert np.abs(ir[1:]).max() > 0

    def test_free_field_no_reflections(self):
        """Doubling the window must not change the early response (grid is
        genuinely free-field within the window)."""
        a = exc.mesh_impulse_response(24)
        b = exc.mesh_impulse_response(48)
        np.testing.assert_allclose(a, b[:24], atol=1e-12)


class TestTransparent:
    def _soft_inject_and_record(self, injected, steps):
        r = steps // 2 + 2
        side = 2 * r + 1
        cur = np.zeros((side, side, side))
        prev = np.zeros_like(cur)
        centre = (r, r, r)
        recorded = []
        for t in range(steps):
            if t < injected.size:
                cur[centre] += injected[t]
            recorded.append(cur[centre])
            total = np.zeros_like(cur)
            total[:-1] += cur[1:]
            total[1:] += cur[:-1]
            total[:, :-1] += cur[:, 1:]
            total[:, 1:] += cur[:, :-1]
            total[:, :, :-1] += cur[:, :, 1:]
            total[:, :, 1:] += cur[:, :, :-1]
            prev, cur = cur, total / 3.0 - prev
        return np.asarray(recorded)

    def test_transparent_source_cancels_mesh_ringing(self):
        """Soft-injecting the transparent dirac must strongly suppress the
        mesh's intrinsic ringing at the source node (first-order
        compensation, as in the reference)."""
        steps = 48
        sig = np.zeros(16)
        sig[0] = 1.0
        transparent = exc.make_transparent(sig, ir_steps=steps)

        plain = self._soft_inject_and_record(sig, steps)
        comp = self._soft_inject_and_record(transparent, steps)

        np.testing.assert_allclose(comp[0], 1.0, atol=1e-9)
        # ringing energy after the impulse: compensated << plain
        ring_plain = np.square(plain[1:16]).sum()
        ring_comp = np.square(comp[1:16]).sum()
        assert ring_comp < 0.2 * ring_plain, (ring_comp, ring_plain)


class TestPcs:
    def test_factdbl(self):
        assert exc.factdbl(5) == 15.0   # 5·3·1
        assert exc.factdbl(6) == 48.0   # 6·4·2
        assert exc.factdbl(0) == 1.0

    def test_maxflat_peak_amplitude(self):
        h, offset = exc.maxflat(0.075, 16, 0.00025, 128)
        assert np.abs(h).max() == pytest.approx(0.00025, rel=1e-9)
        assert offset == 32
        # lowpass: spectrum at DC >> spectrum near nyquist
        spec = np.abs(np.fft.rfft(h, 1024))
        assert spec[0] > 10 * spec[-1]

    def test_mech_sphere_is_bandpass_biquad(self):
        b, a = exc.mech_sphere(0.025, 100.0 / 8000.0, 0.7, 1 / 8000.0)
        assert b[1] == 0.0 and b[2] == -b[0]  # velocity bandpass form
        # stable
        roots = np.roots(a)
        assert np.all(np.abs(roots) < 1.0)

    def test_design_pcs_source_finite_and_offset(self):
        sig, offset = exc.design_pcs_source(
            1 << 10, 400.0, 340.0, 8000.0, 0.1, 0.025, 100.0, 0.7)
        assert sig.shape == (1024,)
        assert offset == 32
        assert np.all(np.isfinite(sig))
        assert np.abs(sig).max() > 0
