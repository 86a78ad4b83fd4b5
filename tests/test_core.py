"""Core math tests — oracles follow the reference's pure-math unit tests
(SURVEY.md §4: geo_tests, attenuator polar patterns, surface conversions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wayverb_tpu.core import geometry, pressure, reverb, surfaces
from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box, TriangleSoup, box_scene
from wayverb_tpu.core.orientation import (angle_lut_indices,
                                          random_unit_vectors, sphere_point)
import jax


class TestSurfaces:
    def test_conversion_chain_roundtrip(self):
        a = jnp.asarray([0.01, 0.1, 0.5, 0.9])
        r = surfaces.absorption_to_pressure_reflectance(a)
        np.testing.assert_allclose(r, np.sqrt(1 - a), rtol=1e-6)
        z = surfaces.pressure_reflectance_to_average_wall_impedance(r)
        # normal incidence recovers the reflectance
        r2 = surfaces.average_wall_impedance_to_pressure_reflectance(z, 1.0)
        np.testing.assert_allclose(r2, r, rtol=1e-5)

    def test_energy_split(self):
        total = jnp.asarray(0.9)
        s = jnp.asarray(0.3)
        np.testing.assert_allclose(
            surfaces.scattered_pressure(total, s)
            + surfaces.specular_pressure(total, s), total, rtol=1e-6)

    def test_grazing_reflectance_is_negative_one(self):
        z = surfaces.pressure_reflectance_to_average_wall_impedance(
            jnp.asarray(0.95))
        r = surfaces.average_wall_impedance_to_pressure_reflectance(z, 0.0)
        np.testing.assert_allclose(r, -1.0, atol=1e-6)


class TestPressure:
    def test_roundtrip(self):
        p = jnp.asarray([-2.0, -0.5, 0.5, 3.0])
        i = pressure.pressure_to_intensity(p, 400.0)
        p2 = pressure.intensity_to_pressure(i, 400.0)
        np.testing.assert_allclose(p2, p, rtol=1e-6)

    def test_distance_law(self):
        np.testing.assert_allclose(
            pressure.intensity_for_distance(1.0), 1 / (4 * np.pi), rtol=1e-6)
        # doubling distance quarters intensity
        np.testing.assert_allclose(
            pressure.intensity_for_distance(2.0),
            pressure.intensity_for_distance(1.0) / 4, rtol=1e-6)


class TestGeometry:
    def setup_method(self):
        self.box = Box((0.0, 0.0, 0.0), (4.0, 3.0, 6.0))
        self.soup = box_scene(self.box)

    def test_ray_hits_triangle(self):
        corners = jnp.asarray([[[0.0, 0, 5], [1, 0, 5], [0, 1, 5]]])
        origin = jnp.asarray([[0.2, 0.2, 0.0]])
        direction = jnp.asarray([[0.0, 0.0, 1.0]])
        t, u, v, hit = geometry.ray_triangle_intersection(
            origin, direction, corners)
        assert bool(hit[0])
        np.testing.assert_allclose(t[0], 5.0, rtol=1e-6)

    def test_scene_intersection_inside_box(self):
        origin = jnp.asarray([[2.0, 1.5, 3.0]])
        direction = jnp.asarray([[1.0, 0.0, 0.0]])
        t, idx, hit = geometry.scene_intersection(
            origin, direction, self.soup)
        assert bool(hit[0])
        np.testing.assert_allclose(t[0], 2.0, rtol=1e-5)  # wall at x=4

    def test_points_inside(self):
        pts = jnp.asarray([
            [2.0, 1.5, 3.0],    # inside
            [5.0, 1.5, 3.0],    # outside x
            [0.1, 0.1, 0.1],    # inside near corner
            [-1.0, -1.0, -1.0], # outside
        ])
        inside = geometry.points_inside(pts, self.soup)
        assert inside.tolist() == [True, False, True, False]

    def test_mirror(self):
        tri = jnp.asarray([[0.0, 0, 5], [1, 0, 5], [0, 1, 5]])
        p = jnp.asarray([0.5, 0.5, 3.0])
        m = geometry.mirror_point(p, tri)
        np.testing.assert_allclose(m, [0.5, 0.5, 7.0], atol=1e-6)

    def test_box_volume_estimate(self):
        vol = geometry.tetrahedron_volume_sum(self.soup)
        np.testing.assert_allclose(vol, 4 * 3 * 6, rtol=1e-5)

    def test_line_of_sight(self):
        start = jnp.asarray([[1.0, 1.0, 1.0]])
        end = jnp.asarray([[3.0, 2.0, 5.0]])
        assert bool(geometry.line_of_sight(start, end, self.soup)[0])

    def test_segment_sphere(self):
        hit = geometry.line_segment_sphere_intersection(
            jnp.asarray([0.0, 0, 0]), jnp.asarray([10.0, 0, 0]),
            jnp.asarray([5.0, 0.05, 0]), 0.1)
        miss = geometry.line_segment_sphere_intersection(
            jnp.asarray([0.0, 0, 0]), jnp.asarray([10.0, 0, 0]),
            jnp.asarray([5.0, 0.5, 0]), 0.1)
        assert bool(hit) and not bool(miss)

    def test_intersection_differentiable(self):
        corners = jnp.asarray([[0.0, 0, 5], [1, 0, 5], [0, 1, 5]])

        def hit_t(z):
            c = corners.at[:, 2].set(z)
            t, _, _, _ = geometry.ray_triangle_intersection(
                jnp.asarray([0.2, 0.2, 0.0]), jnp.asarray([0.0, 0.0, 1.0]),
                c)
            return t

        g = jax.grad(hit_t)(5.0)
        np.testing.assert_allclose(g, 1.0, rtol=1e-5)


class TestReverb:
    def test_sabine_shoebox(self):
        box = Box((0.0, 0.0, 0.0), (4.5, 2.5, 3.5))
        soup = box_scene(box)
        vol = reverb.estimate_room_volume(soup)
        area = reverb.total_area(soup)
        np.testing.assert_allclose(vol, 4.5 * 2.5 * 3.5, rtol=1e-5)
        np.testing.assert_allclose(
            area, 2 * (4.5 * 2.5 + 2.5 * 3.5 + 4.5 * 3.5), rtol=1e-5)
        absorption = jnp.full((1, 8), 0.1)
        a_area = reverb.equivalent_absorption_area(soup, absorption)
        t_sabine = reverb.sabine_reverb_time(vol, a_area)
        expected = 0.161 * vol / (float(area) * 0.1)
        np.testing.assert_allclose(t_sabine, expected, rtol=1e-5)


class TestOrientation:
    def test_sphere_point_unit(self):
        v = sphere_point(jnp.asarray(0.3), jnp.asarray(1.2))
        np.testing.assert_allclose(jnp.linalg.norm(v), 1.0, rtol=1e-6)

    def test_random_unit_vectors_cover_sphere(self):
        v = random_unit_vectors(jax.random.PRNGKey(0), 4096)
        np.testing.assert_allclose(
            jnp.linalg.norm(v, axis=-1), 1.0, rtol=1e-5)
        # mean should be near zero for uniform coverage
        assert float(jnp.linalg.norm(jnp.mean(v, axis=0))) < 0.05

    def test_lut_indices_in_range(self):
        v = random_unit_vectors(jax.random.PRNGKey(1), 1000)
        az, el = angle_lut_indices(v, 20, 9)
        assert int(az.min()) >= 0 and int(az.max()) < 20
        assert int(el.min()) >= 0 and int(el.max()) < 9


class TestEnvironment:
    def test_defaults(self):
        env = Environment()
        assert env.speed_of_sound == 340.0
        np.testing.assert_allclose(env.ambient_density, 400.0 / 340.0)


def test_maximum_length_sequence():
    """MLS autocorrelation: peak n at lag 0, exactly -1 at all other lags."""
    import numpy as np
    from wayverb_tpu.core.kernels import generate_maximum_length_sequence
    for order in (4, 8, 12):
        s = generate_maximum_length_sequence(order)
        n = 2 ** order - 1
        assert s.size == n
        assert set(np.unique(s)) == {-1.0, 1.0}
        ac = np.correlate(np.tile(s, 2), s, "valid")[:n]
        assert ac[0] == n
        assert np.allclose(ac[1:], -1.0)


class TestBrownDudaHRTF:
    """Default HRTF table: Brown–Duda structural model + diffuse-field
    equalization (core/hrtf.py; reference bakes IRCAM data instead,
    src/core/src/attenuator/hrtf.cpp:68-85)."""

    def test_dfe_unit_diffuse_average(self):
        from wayverb_tpu.core import hrtf
        t = np.asarray(hrtf.default_hrtf_table())
        el = (np.arange(hrtf.NUM_EL) - hrtf.NUM_EL // 2) * (
            np.pi / hrtf.NUM_EL)
        w = np.cos(el)[None, :, None, None]
        avg = (t * w).sum((0, 1)) / (hrtf.NUM_AZ * w.sum((0, 1)))
        np.testing.assert_allclose(avg, 1.0, rtol=1e-5)

    def test_ild_monotone_with_frequency(self):
        """Head shadow: a hard-right source's right/left energy ratio
        must grow with band frequency and exceed ~3 dB by the top band."""
        from wayverb_tpu.core import hrtf
        t = np.asarray(hrtf.default_hrtf_table())
        ai = hrtf.NUM_AZ // 4          # az = 90 deg = +x = right
        mid = hrtf.NUM_EL // 2
        ild = t[ai, mid, 1] / np.maximum(t[ai, mid, 0], 1e-12)
        assert ild[0] < 1.1            # low bands barely lateralized
        assert ild[-1] > 2.0
        assert np.all(np.diff(np.log(ild[:5])) > -1e-6)

    def test_pinna_notches_elevation_dependent(self):
        """The pinna comb must make the high-band response vary with
        elevation (the cue the flat spherical head lacks)."""
        from wayverb_tpu.core import hrtf
        t = np.asarray(hrtf.default_hrtf_table())
        front = t[0, :, 1, -2]         # az=0 column over elevations
        assert front.max() / max(front.min(), 1e-12) > 1.2
