"""Hybrid engine tests — mirrors the reference engine smoke test
(combined/tests/wayverb_engine_test.cpp: full render in a 5.56×3.97×2.81
box), crossover complementarity, placement validation, WAV round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayverb_tpu.combined import engine as eng
from wayverb_tpu.combined.postprocess import (crossover_filter,
                                              window_direct_arrival)
from wayverb_tpu.combined.validate import (is_pairwise_distance_acceptable,
                                           validate_placements)
from wayverb_tpu.core.attenuator import Hrtf, Microphone, Null
from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box, box_scene
from wayverb_tpu.core.surfaces import Surface
from wayverb_tpu.utils.audio import read_wav, write_wav

BOX = Box((0.0, 0.0, 0.0), (5.56, 3.97, 2.81))
SOURCE = (2.09, 2.12, 2.12)
RECEIVER = (2.09, 3.08, 0.96)


@pytest.fixture(scope="module")
def engine_results():
    soup = box_scene(BOX)
    surfaces = Surface(absorption=jnp.full((1, 8), 0.1),
                       scattering=jnp.full((1, 8), 0.1))
    e = eng.Engine(soup, surfaces,
                   eng.WaveguideParameters(cutoff=400.0, usable_portion=0.6),
                   scene_box=BOX)
    results = e.run(SOURCE, RECEIVER, jax.random.PRNGKey(0),
                    eng.RaytracerParameters(rays=1 << 13, max_time=1.5))
    return results


class TestEngine:
    def test_full_hybrid_render(self, engine_results):
        ir = eng.render(engine_results, Null(), 16000.0,
                        jax.random.PRNGKey(1))
        ir = np.asarray(ir)
        assert np.all(np.isfinite(ir))
        assert np.abs(ir).max() > 0
        # peak near the direct arrival
        d = np.linalg.norm(np.subtract(SOURCE, RECEIVER))
        arrival = int(d / 340.0 * 16000.0)
        peak = np.abs(ir).argmax()
        assert abs(peak - arrival) < 300
        # energy decays
        assert np.square(ir[-4000:]).sum() < np.square(ir[:4000]).sum()

    def test_all_capsules_render(self, engine_results):
        outs = eng.render_all(
            engine_results,
            [Null(), Microphone(shape=0.5), Hrtf(channel=0), Hrtf(channel=1)],
            jax.random.PRNGKey(2), output_sample_rate=16000.0)
        outs = np.asarray(outs)
        assert outs.shape[0] == 4
        assert np.all(np.isfinite(outs))
        assert np.abs(outs).max() == pytest.approx(1.0)  # normalized

    def test_stochastic_time_drives_waveguide_length(self, engine_results):
        wg = engine_results.waveguide_bands[0]
        assert wg.pressure.shape[-1] > 1000  # ran for the full tail


class TestCrossover:
    def test_complementary_reconstruction(self):
        sr = 8000.0
        t = np.arange(2048) / sr
        sig = (np.sin(2 * np.pi * 100 * t)
               + np.sin(2 * np.pi * 2000 * t)).astype(np.float32)
        out = crossover_filter(jnp.asarray(sig), jnp.asarray(sig),
                               500.0 / sr)
        np.testing.assert_allclose(np.asarray(out)[200:-200], sig[200:-200],
                                   atol=0.05)

    def test_splits_bands(self):
        sr = 8000.0
        t = np.arange(2048) / sr
        lo_sig = jnp.asarray(np.sin(2 * np.pi * 100 * t), dtype=jnp.float32)
        hi_sig = jnp.asarray(np.sin(2 * np.pi * 2000 * t), dtype=jnp.float32)
        # feed the LOW tone into the HIGH input: crossover must kill it
        out = crossover_filter(jnp.zeros(2048), lo_sig, 500.0 / sr)
        assert np.abs(np.asarray(out)[200:-200]).max() < 0.05
        out2 = crossover_filter(jnp.zeros(2048), hi_sig, 500.0 / sr)
        assert np.abs(np.asarray(out2)[200:-200]).max() > 0.9

    def test_window_direct_arrival(self):
        sig = jnp.ones(1000)
        out = window_direct_arrival(sig, (0, 0, 0), (3.4, 0, 0), 8000.0,
                                    340.0)
        out = np.asarray(out)
        assert out[0] == pytest.approx(0.0, abs=1e-6)
        assert out[90] == pytest.approx(1.0, abs=0.05)  # 80-sample window
        np.testing.assert_allclose(out[100:], 1.0)


class TestValidation:
    def test_pairwise_spacing(self):
        assert is_pairwise_distance_acceptable([(0, 0, 0), (1, 0, 0)])
        assert not is_pairwise_distance_acceptable([(0, 0, 0), (0.05, 0, 0)])

    def test_validate_against_mesh(self, engine_results):
        class FakeMesh:
            def require_inside(self, p):
                if p[0] > 5.0:
                    raise RuntimeError("outside")

        validate_placements([(1, 1, 1)], [(2, 1, 1)], FakeMesh())
        with pytest.raises(RuntimeError):
            validate_placements([(6, 1, 1)], [(2, 1, 1)], FakeMesh())
        with pytest.raises(RuntimeError):
            validate_placements([(1, 1, 1)], [(1.05, 1, 1)], FakeMesh())


class TestAudioFile:
    @pytest.mark.parametrize("depth,tol", [("float32", 1e-6),
                                           ("pcm16", 1e-4), ("pcm24", 1e-6)])
    def test_wav_roundtrip(self, tmp_path, depth, tol):
        rng = np.random.default_rng(0)
        data = rng.uniform(-0.9, 0.9, (2, 500))
        path = str(tmp_path / f"test_{depth}.wav")
        write_wav(path, data, 44100, bit_depth=depth)
        back, sr = read_wav(path)
        assert sr == 44100
        np.testing.assert_allclose(back, data, atol=tol)

    def test_mono_roundtrip(self, tmp_path):
        data = np.sin(np.linspace(0, 10, 300))
        path = str(tmp_path / "mono.wav")
        write_wav(path, data, 8000)
        back, sr = read_wav(path)
        assert back.shape == (1, 300)
        np.testing.assert_allclose(back[0], data, atol=1e-6)
