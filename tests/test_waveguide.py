"""Waveguide tests — oracles per SURVEY.md §4: parity vs the per-node naive
reference implementation, Courant relations, pulse travel time, long-run
stability (nan_in_waveguide), Sabine RT (bin/rt60), boundary filter design
(fitted_boundary / boundary_test), differentiability (new capability)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box, box_scene
from wayverb_tpu.signal.filters import decay_time
from wayverb_tpu.signal.iir_design import frequency_response
from wayverb_tpu.signal.multiband import band_centres
from wayverb_tpu.waveguide import boundary as bdry
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.descriptor import (COURANT, MeshDescriptor,
                                              compute_adjusted_boundary,
                                              compute_sampling_frequency,
                                              descriptor_for_box,
                                              grid_spacing, time_step)
from wayverb_tpu.waveguide.naive import naive_step
from wayverb_tpu.waveguide.setup import (build_structure,
                                         classify_boundaries,
                                         classify_inside_shoebox,
                                         classify_inside_scene)
from wayverb_tpu.waveguide.stencil import waveguide_step

ENV = Environment()
FS = 3333.33
DX = grid_spacing(ENV.speed_of_sound, 1.0 / FS)


def small_mesh(box=Box((0, 0, 0), (1.0, 1.1, 1.2)), absorption=0.1,
               coefficients=None):
    soup = box_scene(box)
    if coefficients is None:
        coefficients = bdry.to_flat_coefficients(absorption)
    coef_b, coef_a = bdry.coefficient_table([coefficients])
    adjusted = compute_adjusted_boundary(box, np.asarray(box.centre()), DX)
    desc = descriptor_for_box(adjusted, DX)
    inside = classify_inside_shoebox(desc, box)
    structure = build_structure(desc, inside, soup, coef_b, coef_a)
    return desc, inside, structure, soup


class TestDescriptor:
    def test_courant_relations_roundtrip(self):
        dt = time_step(340.0, 0.1)
        np.testing.assert_allclose(grid_spacing(340.0, dt), 0.1, rtol=1e-9)
        np.testing.assert_allclose(dt, 0.1 / (340.0 * np.sqrt(3)), rtol=1e-9)

    def test_sampling_frequency_for_cutoff(self):
        np.testing.assert_allclose(
            compute_sampling_frequency(500.0, 0.6), 3333.3333, rtol=1e-5)

    def test_adjusted_boundary_anchors_node(self):
        box = Box((0, 0, 0), (2, 2, 2))
        anchor = (1.01, 0.99, 1.5)
        adj = compute_adjusted_boundary(box, anchor, 0.17)
        desc = descriptor_for_box(adj, 0.17)
        loc = desc.locator(anchor)
        np.testing.assert_allclose(desc.position(loc), anchor, atol=1e-9)

    def test_flat_index_matches_reshape(self):
        desc = MeshDescriptor((0, 0, 0), (3, 4, 5), 0.1)
        field = np.arange(60).reshape(3, 4, 5)
        assert field.reshape(-1)[desc.flat_index((1, 2, 3))] == field[1, 2, 3]


class TestClassification:
    def test_shoebox_has_no_reentrant_nodes(self):
        desc, inside, structure, _ = small_mesh()
        cat, _ = classify_boundaries(inside)
        assert int((cat == 1).sum()) == int(inside.sum())

    def test_boundary_counts_scale_with_surface(self):
        desc, inside, structure, _ = small_mesh()
        cat, _ = classify_boundaries(inside)
        n1, n2, n3 = [int((cat == c).sum()) for c in (2, 3, 4)]
        assert n1 > n2 > n3
        assert n3 == 8  # a shoebox has exactly 8 corner nodes

    def test_general_classifier_agrees_with_analytic_on_box(self):
        box = Box((0, 0, 0), (1.0, 1.1, 1.2))
        soup = box_scene(box)
        adjusted = compute_adjusted_boundary(box, np.asarray(box.centre()), DX)
        desc = descriptor_for_box(adjusted, DX)
        analytic = classify_inside_shoebox(desc, box)
        general = classify_inside_scene(desc, soup)
        # ray-parity voting may flip nodes exactly on the surface; the box
        # interior is offset from nodes so expect exact agreement
        assert (analytic == general).mean() > 0.99


class TestStencilParity:
    def test_vectorized_matches_naive_reference(self):
        """The vectorized stencil must reproduce the per-node transcription
        of the reference kernel, boundary filters included."""
        coeffs = bdry.compute_boundary_coefficients(np.full(8, 0.3), FS)
        desc, inside, s, _ = small_mesh(coefficients=coeffs)
        cat, inner = classify_boundaries(inside)
        dims = desc.dimensions
        slot_coef = np.zeros(dims + (3,), dtype=int)

        src = tuple(np.asarray(dims) // 2)
        cur_n = np.zeros(dims)
        cur_n[src] = 1.0
        prev_n = np.zeros(dims)
        fmem = {loc: np.zeros((3, 6)) for loc in np.ndindex(dims)}
        cur_j, prev_j = jnp.asarray(cur_n), jnp.asarray(prev_n)
        fstate = s.initial_filter_state()

        cb = np.asarray(s.coef_b, dtype=np.float64)
        ca = np.asarray(s.coef_a, dtype=np.float64)
        for t in range(8):
            nxt_n = naive_step(cur_n, prev_n, fmem, cat, inner, slot_coef,
                               cb, ca)
            nxt_j, fstate = waveguide_step(cur_j, prev_j, fstate, s)
            np.testing.assert_allclose(np.asarray(nxt_j), nxt_n, atol=2e-5)
            prev_n, cur_n = cur_n, nxt_n
            prev_j, cur_j = cur_j, nxt_j


class TestCanonical:
    def test_pulse_arrival_time(self):
        box = Box((0, 0, 0), (2.0, 2.5, 3.0))
        mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), DX, FS)
        src, rcv = (1.0, 1.2, 0.5), (1.0, 1.2, 2.5)
        out = wgrun.canonical(mesh, src, rcv, 0.05, ENV)
        p = np.asarray(out.pressure)
        # use actual node positions (placement snaps to the grid)
        src_pos = mesh.descriptor.position(mesh.descriptor.locator(src))
        rcv_pos = mesh.descriptor.position(mesh.descriptor.locator(rcv))
        d = np.linalg.norm(src_pos - rcv_pos)
        expected = d / ENV.speed_of_sound * out.sample_rate
        first = np.argmax(np.abs(p) > 0.05 * np.abs(p).max())
        assert abs(first - expected) <= 3, (first, expected)

    def test_long_run_remains_finite(self):
        """nan_in_waveguide oracle: 2 s with fitted boundary filters."""
        box = Box((0, 0, 0), (2.0, 2.5, 3.0))
        mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.05), DX, FS)
        out = wgrun.canonical(mesh, (1.0, 1.2, 1.5), (1.0, 1.2, 2.3), 2.0,
                              ENV)
        assert bool(out.stable)
        p = np.asarray(out.pressure)
        assert np.all(np.isfinite(p))
        # energy decays: late < early
        assert np.square(p[-500:]).sum() < np.square(p[:500]).sum()

    def test_rt60_matches_sabine_small_room(self):
        """bin/rt60 oracle — reference published 0.77% error here."""
        box = Box((0, 0, 0), (2.0, 2.5, 3.0))
        dims = np.asarray(box.max_corner)
        sabine = 0.161 * np.prod(dims) / (
            2 * (dims[0] * dims[1] + dims[1] * dims[2] + dims[0] * dims[2])
            * 0.1)
        mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), DX, FS)
        out = wgrun.canonical(mesh, tuple(dims * 0.35), tuple(dims * 0.65),
                              2.0, ENV)
        t30 = float(decay_time(jnp.asarray(np.asarray(out.pressure)),
                               out.sample_rate, -5, -35))
        assert abs(t30 - sabine) / sabine < 0.05

    def test_placement_outside_mesh_raises(self):
        box = Box((0, 0, 0), (1.0, 1.1, 1.2))
        mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), DX, FS)
        with pytest.raises(RuntimeError):
            wgrun.canonical(mesh, (5.0, 5.0, 5.0), (0.5, 0.5, 0.5), 0.01,
                            ENV)


class TestBoundaryFilters:
    def test_fitted_filter_matches_target_reflectance(self):
        """fitted_boundary oracle: designed |R| hits √(1-a) per band."""
        absorption = np.asarray(
            [0.05, 0.06, 0.08, 0.1, 0.15, 0.2, 0.3, 0.4])
        c = bdry.compute_reflectance_filter_coefficients(absorption, FS)
        centres = np.asarray(band_centres(8)) * 2.0 / FS
        m = centres <= 1.0
        fit = np.abs(frequency_response(c.b, c.a, centres[m]))
        np.testing.assert_allclose(fit, np.sqrt(1 - absorption)[m],
                                   atol=0.01)

    def test_fitted_filter_is_passive(self):
        for a in (0.02, 0.1, 0.5, 0.9):
            c = bdry.compute_reflectance_filter_coefficients(
                np.full(8, a), FS)
            grid = np.linspace(0, 1, 4001)
            assert np.abs(frequency_response(c.b, c.a, grid)).max() <= 1.0

    def test_impedance_transform_roundtrip(self):
        refl = bdry.CanonicalCoefficients(
            b=np.asarray([0.9, 0.1, 0, 0, 0, 0, 0.0]),
            a=np.asarray([1.0, -0.2, 0, 0, 0, 0, 0.0]))
        imp = bdry.to_impedance_coefficients(refl)
        # reflectance recoverable: R = (B-A)/(B+A)
        f = np.linspace(0.01, 0.99, 21)
        orig = np.abs(frequency_response(refl.b, refl.a, f))
        rec = bdry.reflectance_response(imp, f)
        np.testing.assert_allclose(rec, orig, rtol=1e-6)

    def test_flat_coefficients_reflectance(self):
        imp = bdry.to_flat_coefficients(0.19)  # r = 0.9
        rec = bdry.reflectance_response(imp, np.asarray([0.3]))
        np.testing.assert_allclose(rec, 0.9, rtol=1e-6)


class TestMultiband:
    def test_multiband_bands_have_ranges(self):
        box = Box((0, 0, 0), (1.0, 1.1, 1.2))
        mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), DX, FS)
        bands = wgrun.canonical_multiband(
            mesh, np.full((1, 8), 0.1), (0.5, 0.5, 0.5), (0.5, 0.5, 0.9),
            0.02, num_bands=2)
        assert len(bands) == 2
        assert bands[0].valid_hz[1] == pytest.approx(bands[1].valid_hz[0])
        for b in bands:
            assert np.all(np.isfinite(np.asarray(b.pressure)))

    def test_multiband_rt_orders_with_absorption(self):
        """Reverberation-time sanity for the multiband runner: a band run
        with high absorption must decay much faster than one with low
        absorption (reference canonical.h:141-177 flat-coefficient band
        reruns; RT oracle pattern of bin/rt60)."""
        box = Box((0, 0, 0), (1.4, 1.5, 1.6))
        # band 0 dead (a=0.6), band 1 live (a=0.05)
        absorption = np.tile(np.asarray([0.6, 0.05, 0.05, 0.05,
                                         0.05, 0.05, 0.05, 0.05]), (1, 1))
        mesh = wgrun.shoebox_mesh(box, absorption, DX, FS)
        bands = wgrun.canonical_multiband(
            mesh, absorption, (0.7, 0.7, 0.5), (0.7, 0.7, 1.1),
            0.12, num_bands=2)
        decays = []
        for b in bands:
            p = np.asarray(b.pressure)
            e = np.cumsum(p[::-1] ** 2)[::-1]        # Schroeder integral
            e = e / e[0]
            # time (in steps) to fall 20 dB
            idx = np.argmax(e < 1e-2)
            decays.append(idx if idx > 0 else len(e))
        assert decays[0] < 0.6 * decays[1], decays


class TestDifferentiability:
    def test_gradient_wrt_boundary_coefficient(self):
        """d(total energy)/d(impedance b0) is finite and negative-ish:
        more impedance → more reflection → more energy."""
        desc, inside, s, _ = small_mesh(absorption=0.3)
        dims = desc.dimensions
        src_idx = desc.flat_index(tuple(np.asarray(dims) // 2))

        from wayverb_tpu.waveguide.sources import HardSource, impulse_signal
        from wayverb_tpu.waveguide.receivers import NodeReceiver
        from wayverb_tpu.waveguide.run import run_waveguide

        def loss(scale):
            s2 = dataclasses.replace(s, coef_b=s.coef_b * scale)
            source = HardSource(node_idx=jnp.asarray(src_idx),
                                signal=impulse_signal(60, 1.0))
            recv = NodeReceiver(node_idx=jnp.asarray(src_idx + 1))
            result = run_waveguide(s2, dims, source, recv, 60)
            return jnp.sum(jnp.square(result["outputs"]))

        g = jax.grad(loss)(1.0)
        assert np.isfinite(g) and g != 0.0


class TestMultibandVmap:
    def test_vmap_matches_loop(self):
        """The vmapped multiband runner (SURVEY §2.6 vmap-over-bands) must
        reproduce the sequential per-band loop exactly."""
        box = Box((0, 0, 0), (1.0, 1.1, 1.2))
        absorption = np.tile(
            np.asarray([0.3, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1]), (1, 1))
        mesh = wgrun.shoebox_mesh(box, absorption, DX, FS)
        kw = dict(num_bands=2)
        v = wgrun.canonical_multiband(
            mesh, absorption, (0.5, 0.5, 0.5), (0.5, 0.5, 0.9), 0.02,
            use_vmap=True, **kw)
        l = wgrun.canonical_multiband(
            mesh, absorption, (0.5, 0.5, 0.5), (0.5, 0.5, 0.9), 0.02,
            use_vmap=False, **kw)
        for bv, bl in zip(v, l):
            np.testing.assert_allclose(np.asarray(bv.pressure),
                                       np.asarray(bl.pressure), atol=1e-6)
            np.testing.assert_allclose(np.asarray(bv.intensity),
                                       np.asarray(bl.intensity),
                                       atol=1e-6)
            assert bv.valid_hz == bl.valid_hz
