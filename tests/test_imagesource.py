"""Image-source tests — oracle pattern from the reference
(``raytracer/tests/image_source.cpp``, ``equal_energy.cpp``): exact shoebox
lattice, direct-contribution energy law, deposit correctness,
differentiability (new capability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayverb_tpu.core.attenuator import Hrtf, Microphone, Null
from wayverb_tpu.core.geometry import Box, box_scene
from wayverb_tpu.core.impulse import apply_distance_pressure
from wayverb_tpu.imagesource import exact, postprocess as isp
from wayverb_tpu.raytracer.histogram import dirac_histogram, sinc_histogram

BOX = Box((0.0, 0.0, 0.0), (5.56, 3.97, 2.81))
SOURCE = (2.09, 2.12, 2.12)
RECEIVER = (2.09, 3.08, 0.96)
C = 340.0


class TestExact:
    def test_zero_order_image_is_source(self):
        imp = exact.find_impulses(
            BOX, SOURCE, RECEIVER, jnp.full(8, 0.1), max_distance=1e-3)
        # nothing in range => all volumes zero, but lattice still contains
        # the true source position at the central entry
        d_src_rcv = np.linalg.norm(np.subtract(SOURCE, RECEIVER))
        dists = np.asarray(imp.distance)
        assert np.isclose(dists.min(), d_src_rcv, rtol=1e-5)

    def test_direct_path_distance_and_count(self):
        imp = exact.find_impulses(
            BOX, SOURCE, RECEIVER, jnp.full(8, 0.1), max_distance=20.0)
        active = np.asarray(imp.volume[:, 0]) != 0
        assert active.sum() > 50  # plenty of images within 20 m
        d = np.asarray(imp.distance)[active]
        assert d.min() == pytest.approx(
            np.linalg.norm(np.subtract(SOURCE, RECEIVER)), rel=1e-5)

    def test_first_order_wall_reflection_distance(self):
        """Image in the floor (z=0): distance must equal unfolded path."""
        imp = exact.find_impulses(
            BOX, SOURCE, RECEIVER, jnp.full(8, 0.0), max_distance=12.0)
        src, rcv = np.asarray(SOURCE), np.asarray(RECEIVER)
        mirrored = src.copy()
        mirrored[2] = -src[2]
        expected = np.linalg.norm(mirrored - rcv)
        dists = np.asarray(imp.distance)
        assert np.min(np.abs(dists - expected)) < 1e-4

    def test_perfectly_reflective_amplitudes_are_unity(self):
        imp = exact.find_impulses(
            BOX, SOURCE, RECEIVER, jnp.zeros(8), max_distance=15.0)
        active = np.asarray(imp.volume[:, 0]) != 0
        vols = np.abs(np.asarray(imp.volume))[active]
        np.testing.assert_allclose(vols, 1.0, atol=1e-4)

    def test_absorption_reduces_higher_orders_more(self):
        imp = exact.find_impulses(
            BOX, SOURCE, RECEIVER, jnp.full(8, 0.3), max_distance=25.0)
        vols = np.abs(np.asarray(imp.volume[:, 0]))
        dists = np.asarray(imp.distance)
        active = vols > 0
        # direct (closest) has |volume| 1; farthest active images are smaller
        near = vols[active][dists[active].argmin()]
        far = vols[active][dists[active].argmax()]
        assert near == pytest.approx(1.0, abs=1e-5)
        assert far < near

    def test_gradient_wrt_absorption(self):
        def total_pressure(a):
            imp = exact.find_impulses(
                BOX, SOURCE, RECEIVER, jnp.full(8, a), max_distance=15.0)
            return jnp.sum(jnp.abs(imp.volume))

        g = jax.grad(total_pressure)(0.2)
        assert np.isfinite(g) and g < 0  # more absorption, less pressure

    def test_gradient_wrt_source_position(self):
        def first_arrival_proxy(src_z):
            src = jnp.asarray([2.09, 2.12, src_z])
            imp = exact.find_impulses(
                BOX, src, RECEIVER, jnp.full(8, 0.1), max_distance=10.0)
            # soft-min distance (differentiable stand-in for arrival time)
            return jnp.sum(imp.distance * jax.nn.softmax(-imp.distance * 5))

        g = jax.grad(first_arrival_proxy)(2.12)
        assert np.isfinite(g)


class TestDirect:
    def test_direct_visible_in_box(self):
        soup = box_scene(BOX)
        imp = exact.get_direct(SOURCE, RECEIVER, soup)
        assert float(imp.volume[0, 0]) == 1.0
        np.testing.assert_allclose(
            imp.distance[0],
            np.linalg.norm(np.subtract(SOURCE, RECEIVER)), rtol=1e-5)

    def test_direct_energy_matches_inverse_square(self):
        """equal_energy oracle: deposited direct energy ≈ 1/(4πr²)."""
        soup = box_scene(BOX)
        imp = exact.get_direct(SOURCE, RECEIVER, soup)
        imp = apply_distance_pressure(imp, 400.0)
        r = float(imp.distance[0])
        pressure = float(imp.volume[0, 0])
        intensity = pressure * pressure / 400.0
        np.testing.assert_allclose(
            intensity, 1.0 / (4 * np.pi * r * r), rtol=1e-4)


class TestHistogram:
    def test_dirac_deposit(self):
        times = jnp.asarray([0.001, 0.001, 0.0025])
        vols = jnp.ones((3, 2))
        h = dirac_histogram(times, vols, 1000.0, 5)
        np.testing.assert_allclose(h[:, 0], [0, 2, 1, 0, 0])

    def test_dirac_out_of_range_dropped(self):
        h = dirac_histogram(jnp.asarray([10.0]), jnp.ones((1, 1)), 1000.0, 4)
        np.testing.assert_allclose(h, 0.0)

    def test_sinc_deposit_preserves_area_and_peak_position(self):
        times = jnp.asarray([0.5])
        vols = jnp.ones((1, 1))
        sr = 1000.0
        h = np.asarray(sinc_histogram(times, vols, sr, 1000))[:, 0]
        assert abs(h.sum() - 1.0) < 1e-3          # windowed sinc: unit DC
        assert h.argmax() == 500

    def test_sinc_fractional_delay_interpolates(self):
        h = np.asarray(sinc_histogram(
            jnp.asarray([0.0505]), jnp.ones((1, 1)), 1000.0, 200))[:, 0]
        assert h[50] == pytest.approx(h[51], rel=0.3)  # split between bins
        assert h.sum() == pytest.approx(1.0, abs=1e-3)


class TestPostprocess:
    def test_direct_only_ir_peak_at_arrival(self):
        soup = box_scene(BOX)
        imp = apply_distance_pressure(
            exact.get_direct(SOURCE, RECEIVER, soup), 400.0)
        sr = 8000.0
        ir = isp.postprocess(imp, Null(), RECEIVER, C, sr, num_bins=400)
        ir = np.asarray(ir)
        d = np.linalg.norm(np.subtract(SOURCE, RECEIVER))
        expected_sample = int(d / C * sr)
        assert abs(ir.argmax() - expected_sample) <= 1

    def test_full_lattice_ir_finite_and_decaying(self):
        imp = exact.find_impulses(
            BOX, SOURCE, RECEIVER, jnp.full(8, 0.2), max_distance=60.0)
        imp = apply_distance_pressure(imp, 400.0)
        sr = 8000.0
        ir = np.asarray(isp.postprocess(
            imp, Null(), RECEIVER, C, sr, num_bins=2000))
        assert np.all(np.isfinite(ir))
        early = np.abs(ir[:500]).max()
        late = np.abs(ir[1500:]).max()
        assert early > late

    def test_microphone_cardioid_rejects_rear(self):
        """Cardioid facing +z: impulse from behind is attenuated."""
        mic_toward = Microphone(shape=0.5)
        from wayverb_tpu.core.orientation import Orientation
        mic_away = Microphone(
            orientation=Orientation(pointing=(0.0, 0.0, -1.0)), shape=0.5)
        from wayverb_tpu.core.impulse import Impulses
        imp = Impulses(volume=jnp.ones((1, 8)),
                       position=jnp.asarray([[0.0, 0.0, 5.0]]),
                       distance=jnp.asarray([5.0]))
        v_front, _ = isp.attenuate(mic_toward, jnp.zeros(3), imp)
        v_back, _ = isp.attenuate(mic_away, jnp.zeros(3), imp)
        assert float(v_front[0, 0]) == pytest.approx(1.0, abs=1e-5)
        assert float(v_back[0, 0]) == pytest.approx(0.0, abs=1e-5)

    def test_hrtf_ild(self):
        """Sound from the right is louder in the right ear at HF."""
        from wayverb_tpu.core.impulse import Impulses
        imp = Impulses(volume=jnp.ones((1, 8)),
                       position=jnp.asarray([[5.0, 0.0, 0.0]]),
                       distance=jnp.asarray([5.0]))
        v_l, _ = isp.attenuate(Hrtf(channel=0), jnp.zeros(3), imp)
        v_r, _ = isp.attenuate(Hrtf(channel=1), jnp.zeros(3), imp)
        # highest band: right ear (ipsilateral) > left ear (shadowed)
        assert float(v_r[0, -1]) > float(v_l[0, -1])

    def test_ir_differentiable_wrt_absorption(self):
        sr = 4000.0

        def loss(a):
            imp = exact.find_impulses(
                BOX, SOURCE, RECEIVER, jnp.full(8, a), max_distance=30.0)
            imp = apply_distance_pressure(imp, 400.0)
            ir = isp.postprocess(imp, Null(), RECEIVER, C, sr, num_bins=500)
            return jnp.sum(ir * ir)

        g = jax.grad(loss)(0.3)
        assert np.isfinite(g) and g != 0
