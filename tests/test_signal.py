"""Signal-path tests: multiband reconstruction, IIR filters, magnitude-fit
design, resampling — mirrors the reference's frequency_domain and filter
tests (SURVEY.md §4: reconstruction.cpp, multiband_filter.cpp,
arbitrary_magnitude_filter.cpp, dc_blocker_tests.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayverb_tpu.signal import multiband, windows, resample as rs
from wayverb_tpu.signal import filters, iir_design


class TestMultiband:
    def test_band_edges_logarithmic(self):
        edges = np.asarray(multiband.band_edges(8))
        np.testing.assert_allclose(edges[0], 20.0, rtol=1e-5)
        np.testing.assert_allclose(edges[-1], 20000.0, rtol=1e-4)
        ratios = edges[1:] / edges[:-1]
        np.testing.assert_allclose(ratios, ratios[0], rtol=1e-5)

    def test_edge_envelopes_complementary(self):
        """lower² + upper² envelopes sum to 1 across the crossover."""
        p = jnp.linspace(-1.0, 1.0, 101)
        lo = multiband.lower_band_edge(p, 1.0)
        hi = multiband.upper_band_edge(p, 1.0)
        np.testing.assert_allclose(lo + hi, 1.0, atol=1e-6)

    def test_lopass_hipass_sum_to_one(self):
        f = jnp.linspace(0.0, 0.5, 200)
        lo = multiband.compute_lopass_magnitude(f, 0.25, 0.2)
        hi = multiband.compute_hipass_magnitude(f, 0.25, 0.2)
        np.testing.assert_allclose(lo + hi, 1.0, atol=1e-6)

    def test_multiband_reconstruction(self, rng):
        """Filtering a broadband signal into 8 bands and summing must
        reconstruct it (complementary crossovers) within the covered range."""
        sr = 44100.0
        n = 4096
        t = np.arange(n) / sr
        sig = np.zeros(n, np.float32)
        for f in [100, 430, 1200, 5000, 15000]:
            sig += np.sin(2 * np.pi * f * t).astype(np.float32)
        out = multiband.multiband_filter_and_mixdown(
            jnp.tile(jnp.asarray(sig)[None, :], (8, 1)), sr)
        # interior comparison (edge effects from the FFT window)
        sl = slice(200, n - 200)
        err = np.abs(np.asarray(out)[sl] - sig[sl]).max()
        # the 20 Hz band edge rings over ~1/(8 Hz) ≈ 5k samples, so exact
        # reconstruction is bounded by that edge; 5% of peak matches the
        # reference's tolerance class
        assert err < 0.05 * np.abs(sig).max(), err

    def test_per_band_energy_locates_tone(self):
        sr = 44100.0
        n = 8192
        t = np.arange(n) / sr
        sig = jnp.asarray(np.sin(2 * np.pi * 1000 * t), dtype=jnp.float32)
        energy = np.asarray(multiband.per_band_energy(sig, sr))
        centres = np.asarray(multiband.band_centres(8))
        # 1 kHz sits in the band whose centre is nearest 1 kHz
        assert energy.argmax() == np.abs(centres - 1000).argmin()


class TestWindows:
    def test_sinc_kernel_dc_gain(self):
        k = windows.sinc_kernel(0.25, 255)
        np.testing.assert_allclose(jnp.sum(k), 2.0, atol=0.05)

    def test_left_hanning_endpoints(self):
        w = np.asarray(windows.left_hanning(64))
        assert w[0] == pytest.approx(0.0, abs=1e-6)
        assert w[-1] == pytest.approx(1.0, abs=1e-6)


class TestIIR:
    def test_iir_impulse_response_matches_numpy(self):
        b = jnp.asarray([0.2, 0.3, 0.1])
        a = jnp.asarray([1.0, -0.5, 0.25])
        x = jnp.zeros(64).at[0].set(1.0)
        y, _ = filters.iir_filter(b, a, x)
        # direct recurrence oracle
        ref = np.zeros(64)
        xn = np.zeros(64)
        xn[0] = 1
        for n in range(64):
            acc = sum(float(b[i]) * xn[n - i] for i in range(3) if n - i >= 0)
            acc -= sum(float(a[i]) * ref[n - i] for i in range(1, 3)
                       if n - i >= 0)
            ref[n] = acc
        np.testing.assert_allclose(y, ref, atol=1e-5)

    def test_filter_step_matches_scan(self):
        b = jnp.asarray([0.2, 0.3, 0.1, 0.05])
        a = jnp.asarray([1.0, -0.4, 0.2, -0.1])
        x = jnp.asarray(np.random.default_rng(0).normal(size=32),
                        dtype=jnp.float32)
        y_scan, _ = filters.iir_filter(b, a, x)
        state = jnp.zeros(3)
        ys = []
        for n in range(32):
            y, state = filters.filter_step(x[n], state, b, a)
            ys.append(float(y))
        np.testing.assert_allclose(ys, y_scan, atol=1e-5)

    def test_dc_blocker_kills_dc(self):
        b, a = filters.dc_blocker_coefficients()
        x = jnp.ones(2048)
        y, _ = filters.iir_filter(b, a, x)
        assert abs(float(y[-1])) < 1e-2

    def test_decay_time_of_synthetic_exponential(self):
        sr = 1000.0
        t60 = 0.7
        t = jnp.arange(int(sr * 1.5)) / sr
        sig = jnp.power(10.0, -3.0 * t / t60)  # -60 dB at t60 (amplitude)
        measured = float(filters.decay_time(sig, sr, -5.0, -35.0))
        np.testing.assert_allclose(measured, t60, rtol=0.05)


class TestIIRDesign:
    def test_schur_stability(self):
        assert iir_design.is_stable([1.0, -0.5])
        assert not iir_design.is_stable([1.0, -1.5])
        assert iir_design.is_stable([1.0, -1.6, 0.81])   # poles at 0.9
        assert not iir_design.is_stable([1.0, -2.05, 1.1])

    def test_polystab_reflects_roots(self):
        a = np.poly([1.5, 0.5])  # one unstable root
        st = iir_design.polystab(a)
        assert iir_design.is_stable(st)

    def test_fit_flat_response(self):
        freqs = np.linspace(0.05, 0.95, 8)
        mags = np.full(8, 0.7)
        b, a = iir_design.design_magnitude_filter(
            freqs, mags, 6, pin_edges_to_zero=False)
        assert iir_design.is_stable(a)
        h = np.abs(iir_design.frequency_response(b, a, freqs))
        np.testing.assert_allclose(h, 0.7, rtol=0.05)

    def test_fit_sloped_response(self):
        """Typical boundary reflectance: high at LF, rolling off at HF."""
        freqs = np.asarray([0.05, 0.1, 0.2, 0.35, 0.5, 0.7, 0.9])
        mags = np.asarray([0.98, 0.97, 0.95, 0.9, 0.8, 0.6, 0.4])
        b, a = iir_design.design_magnitude_filter(
            freqs, mags, 6, pin_edges_to_zero=False)
        assert iir_design.is_stable(a)
        h = np.abs(iir_design.frequency_response(b, a, freqs))
        np.testing.assert_allclose(h, mags, atol=0.04)

    def test_fit_with_pinned_edges(self):
        """Reference-style envelope with zero at DC and Nyquist still yields
        a stable fit close to the targets away from the pins."""
        freqs = np.asarray([0.1, 0.2, 0.4, 0.6, 0.8])
        mags = np.asarray([0.9, 0.88, 0.85, 0.8, 0.75])
        b, a = iir_design.design_magnitude_filter(freqs, mags, 6)
        assert iir_design.is_stable(a)
        h = np.abs(iir_design.frequency_response(b, a, freqs[1:-1]))
        np.testing.assert_allclose(h, mags[1:-1], atol=0.15)


class TestResample:
    def test_preserves_tone_frequency(self):
        in_sr, out_sr = 8000.0, 44100.0
        n = 2048
        t_in = np.arange(n) / in_sr
        sig = jnp.asarray(np.sin(2 * np.pi * 440 * t_in), dtype=jnp.float32)
        out = rs.resample(sig, in_sr, out_sr)
        out_n = out.shape[-1]
        # measure frequency via FFT peak
        spec = np.abs(np.fft.rfft(np.asarray(out) * np.hanning(out_n)))
        peak = spec.argmax() * out_sr / out_n
        assert abs(peak - 440) < 5
        # level convention: scaled by in_sr/out_sr
        expected_amp = (in_sr / out_sr)
        amp = np.abs(np.asarray(out)[out_n // 4: 3 * out_n // 4]).max()
        np.testing.assert_allclose(amp, expected_amp, rtol=0.05)


class TestAiff:
    def test_aiff_roundtrip(self, tmp_path):
        """AIFF write/read parity (the reference writes WAV and AIFF via
        libsndfile, threaded_engine.cpp:241-280)."""
        from wayverb_tpu.utils.audio import (read_aiff, write_aiff,
                                             write_audio)
        x = np.sin(np.linspace(0, 40, 2001))[None, :] * 0.7
        x2 = np.vstack([x, 0.3 * x])
        for depth, tol in (("pcm16", 2e-4), ("pcm24", 1e-6)):
            p = tmp_path / f"t_{depth}.aiff"
            write_aiff(str(p), x2, 44100.0, depth)
            y, r = read_aiff(str(p))
            assert r == 44100.0
            np.testing.assert_allclose(y, x2, atol=tol)
        # extension dispatch
        write_audio(str(tmp_path / "t.aif"), x2, 48000.0)
        y, r = read_aiff(str(tmp_path / "t.aif"))
        assert r == 48000.0 and y.shape == x2.shape
