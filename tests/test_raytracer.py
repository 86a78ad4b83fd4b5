"""Ray tracer tests — reference oracles (SURVEY.md §4): direct energy vs
1/(4πr²) (equal_energy.cpp), image-source paths vs the exact shoebox solver
(image_source.cpp), histogram binning, dirac-sequence statistics, Sabine
tail slope."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayverb_tpu.core.attenuator import Microphone, Null
from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box, box_scene
from wayverb_tpu.core.surfaces import Surface
from wayverb_tpu.imagesource import exact
from wayverb_tpu.imagesource.tree import (collect_paths,
                                          find_image_source_impulses,
                                          validate_paths)
from wayverb_tpu.raytracer import stochastic, tracer

ENV = Environment()
BOX = Box((0.0, 0.0, 0.0), (5.56, 3.97, 2.81))
SOURCE = (2.09, 2.12, 2.12)
RECEIVER = (2.09, 3.08, 0.96)


def make_surfaces(absorption=0.1, scattering=0.1, n=1):
    return Surface(absorption=jnp.full((n, 8), absorption),
                   scattering=jnp.full((n, 8), scattering))


class TestTracer:
    def test_direct_specular_energy_matches_inverse_square(self):
        """equal_energy oracle: with zero image-source order, the direct
        specular detection deposits ≈ 1/(4πr²) of total energy."""
        soup = box_scene(BOX)
        surfaces = make_surfaces(absorption=1.0, scattering=0.0)
        res = tracer.trace_jit(
            soup, surfaces, SOURCE, RECEIVER, jax.random.PRNGKey(0),
            num_rays=100000, depth=1, max_time=0.2,
            max_image_source_order=0)
        hist = np.asarray(res.summed_histogram())
        total = hist.sum(axis=0)  # per band
        r = np.linalg.norm(np.subtract(SOURCE, RECEIVER))
        expected = 1.0 / (4 * np.pi * r * r)
        # ~112 crossing rays expected → ~10% Poisson noise
        np.testing.assert_allclose(total, expected, rtol=0.3)

    def test_direct_energy_lands_in_correct_bin(self):
        soup = box_scene(BOX)
        surfaces = make_surfaces(absorption=1.0, scattering=0.0)
        res = tracer.trace_jit(
            soup, surfaces, SOURCE, RECEIVER, jax.random.PRNGKey(1),
            num_rays=5000, depth=1, max_time=0.2)
        hist = np.asarray(res.summed_histogram())[:, 0]
        r = np.linalg.norm(np.subtract(SOURCE, RECEIVER))
        expected_bin = int(r / ENV.speed_of_sound * 1000.0)
        assert hist.argmax() == expected_bin

    def test_higher_absorption_less_late_energy(self):
        soup = box_scene(BOX)
        outs = []
        for a in (0.05, 0.5):
            res = tracer.trace_jit(
                soup, make_surfaces(absorption=a, scattering=0.2),
                SOURCE, RECEIVER, jax.random.PRNGKey(2),
                num_rays=2000, depth=20, max_time=1.0)
            hist = np.asarray(res.summed_histogram())
            outs.append(hist[200:, :].sum())  # tail beyond 0.2 s
        assert outs[1] < outs[0] * 0.1

    def test_triangle_history_records_hits(self):
        soup = box_scene(BOX)
        res = tracer.trace_jit(
            soup, make_surfaces(), SOURCE, RECEIVER, jax.random.PRNGKey(3),
            num_rays=64, depth=4, max_time=0.5)
        h = np.asarray(res.triangle_history)
        assert h.shape == (4, 64)
        assert (h[0] >= 0).all()  # every ray hits the closed box
        assert (h[0] < soup.num_triangles).all()

    def test_decay_slope_tracks_sabine(self):
        """Tail energy decay rate vs the Sabine prediction (bin/rt60-style).

        The bounce depth must come from the optimum reflection number —
        too few bounces truncate the tail and fake a faster decay.
        """
        box = Box((0, 0, 0), (4.5, 2.5, 3.5))
        soup = box_scene(box)
        a = 0.1
        depth = tracer.compute_optimum_reflection_number(a)
        assert depth == 132  # ⌈−6/log₁₀(0.9)⌉, optimum_reflection_number.h
        res = tracer.trace_jit(
            soup, make_surfaces(absorption=a, scattering=0.1),
            (1.5, 1.2, 1.0), (3.0, 1.4, 2.5), jax.random.PRNGKey(4),
            num_rays=10000, depth=depth, max_time=1.2)
        hist = np.asarray(res.summed_histogram())[:, 0]
        t = np.arange(len(hist)) / 1000.0
        sel = (hist > 0) & (t > 0.05) & (t < 0.8)
        slope = np.polyfit(t[sel], 10 * np.log10(hist[sel]), 1)[0]  # dB/s
        dims = np.asarray(box.max_corner)
        vol, area = np.prod(dims), 2 * (
            dims[0] * dims[1] + dims[1] * dims[2] + dims[0] * dims[2])
        sabine = 0.161 * vol / (area * a)
        np.testing.assert_allclose(-60.0 / slope, sabine, rtol=0.15)


class TestImageSourceTree:
    def test_collect_paths_dedupes(self):
        hist = jnp.asarray([[3, 3, 5, -1], [7, 7, 2, 2]]).T.reshape(4, 2)
        # rays: [3,7], [3,7], [5,2], [-1,2]
        groups = collect_paths(jnp.asarray([[3, 3, 5, -1], [7, 7, 2, 2]]), 2)
        assert 1 in groups and len(groups[1]) <= 3
        assert 2 in groups

    def test_validated_paths_match_exact_shoebox(self):
        """The big oracle: traced+validated image sources must reproduce the
        closed-form lattice solution (time & magnitude) for first/second
        order reflections."""
        soup = box_scene(BOX)
        surfaces = make_surfaces(absorption=0.1, scattering=0.0)
        res = tracer.trace_jit(
            soup, surfaces, SOURCE, RECEIVER, jax.random.PRNGKey(5),
            num_rays=20000, depth=3, max_time=0.5)
        found = find_image_source_impulses(
            res.triangle_history, soup, surfaces, SOURCE, RECEIVER,
            max_order=2)
        # oracle: exact lattice limited to orders with |i|+|j|+|k| <= 2
        oracle = exact.find_impulses(
            BOX, SOURCE, RECEIVER, jnp.full(8, 0.1), max_distance=25.0)
        o_vol = np.asarray(oracle.volume[:, 0])
        o_dist = np.asarray(oracle.distance)
        active = np.abs(o_vol) > 0

        f_dist = np.sort(np.asarray(found.distance))
        # every found path's distance appears in the oracle set
        for d in f_dist:
            assert np.min(np.abs(o_dist[active] - d)) < 1e-3, d
        # with 20k rays we should find at least the six 1st-order walls
        assert len(f_dist) >= 6

        # magnitudes agree per matching distance
        f_vol = np.asarray(found.volume[:, 0])
        for d, v in zip(np.asarray(found.distance), f_vol):
            i = np.abs(o_dist - d).argmin()
            np.testing.assert_allclose(v, o_vol[i], rtol=1e-3)

    def test_invalid_paths_rejected(self):
        """Paths of triangles that can't form a specular chain get zero."""
        soup = box_scene(BOX)
        # two triangles on the SAME wall can't be consecutive reflections
        paths = np.asarray([[0, 1]], dtype=np.int32)
        v = validate_paths(paths, soup, SOURCE, RECEIVER)
        assert not v.valid[0]


class TestStochasticSynthesis:
    def test_dirac_sequence_rate_statistics(self):
        key = jax.random.PRNGKey(6)
        c, vol, sr = 340.0, 100.0, 8000.0
        seq = np.asarray(stochastic.generate_dirac_sequence(
            key, c, vol, sr, 1.0))
        constant = stochastic.constant_mean_event_occurrence(c, vol)
        # early region rate ~ constant·t², late capped at 10 kHz → p≈1-e^-1.25
        t = np.arange(len(seq)) / sr
        for lo, hi in [(0.05, 0.1), (0.2, 0.3)]:
            sel = (t >= lo) & (t < hi)
            measured = (seq[sel] != 0).mean() * sr
            lam = np.minimum(constant * ((lo + hi) / 2) ** 2, 10000.0)
            expected = (1 - np.exp(-lam / sr)) * sr
            np.testing.assert_allclose(measured, expected, rtol=0.2)

    def test_weight_sequence_preserves_bin_energy(self):
        key = jax.random.PRNGKey(7)
        hist = jnp.ones((10, 8)) * 2.0
        seq = stochastic.generate_dirac_sequence(key, 340.0, 50.0, 8000.0,
                                                 10 / 1000.0)
        weighted = stochastic.weight_sequence(hist, 1000.0, seq, 8000.0,
                                              400.0)
        # energy of each bin of 8 samples: sum(p²)/Z == hist value
        w = np.asarray(weighted)
        for b in range(9):
            seg = w[b * 8:(b + 1) * 8, 0]
            if np.any(seg != 0):
                np.testing.assert_allclose(
                    np.square(seg).sum() / 400.0, 2.0, rtol=1e-4)

    def test_attenuate_histogram_null_sums(self):
        h = jnp.ones((5, 20, 9, 8))
        out = stochastic.attenuate_histogram(h, Null())
        np.testing.assert_allclose(out, 20 * 9)

    def test_attenuate_histogram_cardioid_halves_energy(self):
        """Integrating cardioid² over the sphere gives 1/3 the omni energy
        (∫(½+½cosθ)² dΩ / 4π = 1/3)."""
        h = jnp.ones((2, 20, 9, 8))
        out = np.asarray(stochastic.attenuate_histogram(
            h, Microphone(shape=0.5)))
        # bins aren't perfectly equal-solid-angle; loose tolerance
        np.testing.assert_allclose(out / (20 * 9), 1 / 3, rtol=0.25)

    def test_postprocess_end_to_end(self):
        soup = box_scene(BOX)
        res = tracer.trace_jit(
            soup, make_surfaces(absorption=0.1, scattering=0.2),
            SOURCE, RECEIVER, jax.random.PRNGKey(8),
            num_rays=2000, depth=30, max_time=1.0)
        tail = stochastic.postprocess(
            res.histogram, res.histogram_sample_rate, Null(),
            room_volume=float(np.prod(BOX.max_corner)), environment=ENV,
            output_sample_rate=8000.0, key=jax.random.PRNGKey(9))
        tail = np.asarray(tail)
        assert np.all(np.isfinite(tail))
        assert np.abs(tail).max() > 0
        # decays overall
        assert np.square(tail[-2000:]).sum() < np.square(tail[:2000]).sum()


class TestTraceJitRecompileStability:
    def test_padded_depth_matches_plain_trace(self):
        """trace_jit's padded depth + traced active_depth must reproduce
        the unpadded trace exactly (masked bounces deposit nothing)."""
        import jax
        from wayverb_tpu.raytracer.tracer import trace, trace_jit
        soup = box_scene(Box((0, 0, 0), (4.0, 3.0, 5.0)))
        surfaces = Surface(absorption=jnp.full((1, 8), 0.2),
                           scattering=jnp.full((1, 8), 0.15))
        key = jax.random.PRNGKey(3)
        kw = dict(num_rays=256, depth=5, max_time=0.3)
        a = trace(soup, surfaces, (1.0, 1.0, 1.0), (3.0, 2.0, 4.0), key,
                  **kw)
        b = trace_jit(soup, surfaces, (1.0, 1.0, 1.0), (3.0, 2.0, 4.0),
                      key, **kw)
        nb = a.histogram.shape[0]
        np.testing.assert_allclose(np.asarray(b.histogram[:nb]),
                                   np.asarray(a.histogram), atol=1e-6)
        assert np.all(np.asarray(b.histogram[nb:]) == 0.0)

    def test_absorption_sweep_does_not_recompile(self):
        """Changing absorption (→ different optimum reflection count and
        horizon) must reuse ONE compiled executable per padded bucket
        (VERDICT r3/r4 recompile cliffs)."""
        import jax
        from wayverb_tpu.raytracer import tracer as trc
        soup = box_scene(Box((0, 0, 0), (4.0, 3.0, 5.0)))
        key = jax.random.PRNGKey(4)
        trc._trace_jit._clear_cache()
        for depth, mt, a in ((5, 0.28, 0.2), (7, 0.31, 0.1),
                             (6, 0.26, 0.3)):
            surfaces = Surface(absorption=jnp.full((1, 8), a),
                               scattering=jnp.full((1, 8), 0.15))
            trc.trace_jit(soup, surfaces, (1.0, 1.0, 1.0),
                          (3.0, 2.0, 4.0), key, num_rays=256,
                          depth=depth, max_time=mt)
        assert trc._trace_jit._cache_size() == 1
