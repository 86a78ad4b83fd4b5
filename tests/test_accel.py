"""Voxel-DDA ray acceleration: parity with the dense (R, T) broadcast on
both the primitive queries and a full trace, plus hall-scale physics."""

import jax
import jax.numpy as jnp
import numpy as np

from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import (Box, box_scene, line_of_sight,
                                       scene_intersection)
from wayverb_tpu.core.orientation import random_unit_vectors
from wayverb_tpu.core.surfaces import Surface
from wayverb_tpu.raytracer import tracer
from wayverb_tpu.raytracer.accel import (build_ray_grid, grid_intersection,
                                         grid_line_of_sight)
from wayverb_tpu.raytracer.scenes import procedural_hall

ENV = Environment()


def surfaces(a=0.1, s=0.1):
    return Surface(absorption=jnp.full((1, 8), a),
                   scattering=jnp.full((1, 8), s))


def random_rays_inside(soup_box, n, key):
    lo = np.asarray(soup_box.min_corner) + 0.3
    hi = np.asarray(soup_box.max_corner) - 0.3
    ku, kd = jax.random.split(key)
    origins = jax.random.uniform(ku, (n, 3)) * (hi - lo) + lo
    dirs = random_unit_vectors(kd, n)
    return origins.astype(jnp.float32), dirs


class TestGridQueries:
    def test_closest_hit_matches_dense_hall(self):
        soup, _ = procedural_hall(shell_div=8, n_columns=3, column_div=2)
        grid = build_ray_grid(soup)
        box = Box((0, 0, 0), (20.0, 8.0, 15.0))
        origins, dirs = random_rays_inside(box, 512, jax.random.PRNGKey(0))
        td, trid, hitd = scene_intersection(origins, dirs, soup)
        tg, trig, hitg = grid_intersection(origins, dirs, grid, soup)
        np.testing.assert_array_equal(np.asarray(hitg), np.asarray(hitd))
        m = np.asarray(hitd)
        np.testing.assert_allclose(np.asarray(tg)[m], np.asarray(td)[m],
                                   rtol=1e-5)
        # triangle ids may differ only where two triangles share the hit
        # point (equal t); check the distances instead of ids there
        same = np.asarray(trig)[m] == np.asarray(trid)[m]
        assert same.mean() > 0.98

    def test_exclude_triangle(self):
        soup, _ = procedural_hall(shell_div=6, n_columns=0)
        grid = build_ray_grid(soup)
        box = Box((0, 0, 0), (20.0, 8.0, 15.0))
        origins, dirs = random_rays_inside(box, 128, jax.random.PRNGKey(1))
        _, tri, hit = grid_intersection(origins, dirs, grid, soup)
        # relaunch from the hit surface excluding it: must not self-hit
        t2, tri2, hit2 = grid_intersection(origins, dirs, grid, soup,
                                           exclude_triangle=tri)
        m = np.asarray(hit) & np.asarray(hit2)
        assert not np.any(np.asarray(tri2)[m] == np.asarray(tri)[m])

    def test_line_of_sight_matches_dense(self):
        soup, _ = procedural_hall(shell_div=6, n_columns=4, column_div=2)
        grid = build_ray_grid(soup)
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.uniform([1, 1, 1], [19, 7, 14],
                                    (256, 3)).astype(np.float32))
        b = jnp.asarray(rng.uniform([1, 1, 1], [19, 7, 14],
                                    (256, 3)).astype(np.float32))
        dense = np.asarray(line_of_sight(a, b, soup))
        grd = np.asarray(grid_line_of_sight(a, b, grid, soup))
        assert (dense == grd).mean() > 0.99    # boundary-grazing slack


class TestPallasMT:
    """VMEM-tiled Möller–Trumbore kernel vs the dense oracle."""

    def test_closest_hit_matches_dense(self):
        from wayverb_tpu.raytracer.mt_pallas import (build_pallas_triangles,
                                                     mt_intersection)
        soup, _ = procedural_hall(shell_div=8, n_columns=3, column_div=2)
        tris = build_pallas_triangles(soup)
        box = Box((0, 0, 0), (20.0, 8.0, 15.0))
        origins, dirs = random_rays_inside(box, 600, jax.random.PRNGKey(2))
        td, trid, hitd = scene_intersection(origins, dirs, soup)
        tp, trip, hitp = mt_intersection(origins, dirs, tris,
                                         interpret=True)
        np.testing.assert_array_equal(np.asarray(hitp), np.asarray(hitd))
        m = np.asarray(hitd)
        np.testing.assert_allclose(np.asarray(tp)[m], np.asarray(td)[m],
                                   rtol=1e-5)
        assert (np.asarray(trip)[m] == np.asarray(trid)[m]).mean() > 0.98

    def test_exclude_and_padding(self):
        from wayverb_tpu.raytracer.mt_pallas import (build_pallas_triangles,
                                                     mt_intersection)
        soup, _ = procedural_hall(shell_div=6, n_columns=0)
        tris = build_pallas_triangles(soup)
        box = Box((0, 0, 0), (20.0, 8.0, 15.0))
        # R=100: not a multiple of the ray tile (exercises ray padding)
        origins, dirs = random_rays_inside(box, 100, jax.random.PRNGKey(4))
        _, tri, hit = mt_intersection(origins, dirs, tris, interpret=True)
        t2, tri2, hit2 = mt_intersection(origins, dirs, tris,
                                         exclude_triangle=tri,
                                         interpret=True)
        m = np.asarray(hit) & np.asarray(hit2)
        assert not np.any(np.asarray(tri2)[m] == np.asarray(tri)[m])

    def test_trace_matches_dense(self):
        from wayverb_tpu.raytracer.mt_pallas import build_pallas_triangles
        box = Box((0, 0, 0), (5.56, 3.97, 2.81))
        soup = box_scene(box)
        tris = build_pallas_triangles(soup)
        kwargs = dict(num_rays=512, depth=10, max_time=0.6)
        rd = tracer.trace(soup, surfaces(), (2.1, 2.1, 1.2),
                          (2.1, 3.0, 0.9), jax.random.PRNGKey(5), **kwargs)
        rp = tracer.trace(soup, surfaces(), (2.1, 2.1, 1.2),
                          (2.1, 3.0, 0.9), jax.random.PRNGKey(5),
                          accel=tris, **kwargs)
        np.testing.assert_array_equal(np.asarray(rp.triangle_history),
                                      np.asarray(rd.triangle_history))
        np.testing.assert_allclose(np.asarray(rp.histogram),
                                   np.asarray(rd.histogram),
                                   rtol=1e-4, atol=1e-8)


class TestAcceleratedTrace:
    def test_trace_matches_dense_on_box(self):
        """Identical RNG ⇒ identical bounce sequence ⇒ identical histogram
        (box scene, both paths)."""
        box = Box((0, 0, 0), (5.56, 3.97, 2.81))
        soup = box_scene(box)
        grid = build_ray_grid(soup)
        kwargs = dict(num_rays=512, depth=12, max_time=0.6)
        rd = tracer.trace(soup, surfaces(), (2.1, 2.1, 1.2),
                          (2.1, 3.0, 0.9), jax.random.PRNGKey(5), **kwargs)
        rg = tracer.trace(soup, surfaces(), (2.1, 2.1, 1.2),
                          (2.1, 3.0, 0.9), jax.random.PRNGKey(5),
                          accel=grid, **kwargs)
        np.testing.assert_allclose(np.asarray(rg.histogram),
                                   np.asarray(rd.histogram),
                                   rtol=1e-4, atol=1e-8)
        np.testing.assert_array_equal(np.asarray(rg.triangle_history),
                                      np.asarray(rd.triangle_history))

    def test_hall_direct_energy_inverse_square(self):
        """Physics check at hall scale: direct (bounce-0 specular) energy
        at the receiver ≈ 1/(4πr²) per band."""
        soup, ntris = procedural_hall(shell_div=10, n_columns=0)
        assert ntris >= 1000
        grid = build_ray_grid(soup)
        src, rcv = (10.0, 4.0, 5.0), (10.0, 4.0, 9.0)
        res = tracer.trace(soup, surfaces(a=1.0, s=0.0), src, rcv,
                           jax.random.PRNGKey(7), num_rays=60000, depth=1,
                           max_time=0.2, receiver_radius=0.3, accel=grid)
        total = float(jnp.sum(res.histogram)) / 8     # per band
        r = 4.0
        expected = 1.0 / (4 * np.pi * r * r)
        # ~165 expected sphere crossings at this radius/ray count → ~8%
        # Poisson noise; 25% tolerance ≈ 3σ
        np.testing.assert_allclose(total, expected, rtol=0.25)


class TestMortonCulling:
    """Two-level MT acceleration (Morton tile AABB gate + ray sort)."""

    def test_culled_matches_plain_jnp(self):
        from wayverb_tpu.raytracer.mt_pallas import (
            build_pallas_triangles, mt_intersection)
        from wayverb_tpu.raytracer.scenes import procedural_hall
        soup, nT = procedural_hall(shell_div=10, n_columns=3)
        plain = build_pallas_triangles(soup, cull=False)
        culled = build_pallas_triangles(soup, cull=True)
        rng = np.random.RandomState(0)
        R = 1024
        o = jnp.asarray((rng.uniform(0.1, 0.9, (R, 3))
                         * np.asarray([20, 8, 15])).astype(np.float32))
        d = rng.randn(R, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        ex = jnp.asarray(rng.randint(-1, nT, R).astype(np.int32))
        t0, i0, h0 = mt_intersection(o, jnp.asarray(d), plain, ex)
        t1, i1, h1 = mt_intersection(o, jnp.asarray(d), culled, ex)
        np.testing.assert_allclose(np.asarray(t0), np.asarray(t1),
                                   rtol=1e-6)
        assert np.array_equal(np.asarray(h0), np.asarray(h1))
        hm = np.asarray(h0)
        assert np.array_equal(np.asarray(i0)[hm], np.asarray(i1)[hm])

    def test_culled_kernel_interpret(self):
        """The AABB-gated Pallas kernel (interpret mode) must equal the
        jnp oracle on the same Morton-sorted data."""
        from wayverb_tpu.raytracer.mt_pallas import (
            _jnp_closest, _pallas_closest, build_pallas_triangles)
        from wayverb_tpu.raytracer.scenes import procedural_hall
        soup, nT = procedural_hall(shell_div=6, n_columns=2)
        culled = build_pallas_triangles(soup, cull=True)
        rng = np.random.RandomState(1)
        R = 512
        o = jnp.asarray((rng.uniform(0.2, 0.8, (R, 3))
                         * np.asarray([20, 8, 15])).astype(np.float32))
        d = rng.randn(R, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        ex = jnp.full((R,), -1, jnp.int32)
        t_k, i_k = _pallas_closest(o, jnp.asarray(d), ex, culled,
                                   interpret=True)
        t_j, i_j = _jnp_closest(o, jnp.asarray(d), ex, culled)
        np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_j),
                                   rtol=1e-5)
        assert np.array_equal(np.asarray(i_k), np.asarray(i_j))

    def test_trace_with_culled_accel(self):
        """End-to-end stochastic trace through the culled accel deposits
        the same energy as the plain MT path."""
        from wayverb_tpu.core.surfaces import Surface
        from wayverb_tpu.raytracer.mt_pallas import build_pallas_triangles
        from wayverb_tpu.raytracer.scenes import procedural_hall
        from wayverb_tpu.raytracer.tracer import trace
        soup, nT = procedural_hall(shell_div=8, n_columns=2)
        surfaces = Surface(absorption=jnp.full((1, 8), 0.1),
                           scattering=jnp.full((1, 8), 0.1))
        key = jax.random.PRNGKey(3)
        kw = dict(num_rays=256, depth=6, max_time=0.4)
        r_plain = trace(soup, surfaces, (2.0, 1.7, 3.0), (6.0, 1.9, 9.0),
                        key, accel=build_pallas_triangles(soup,
                                                          cull=False),
                        **kw)
        r_cull = trace(soup, surfaces, (2.0, 1.7, 3.0), (6.0, 1.9, 9.0),
                       key, accel=build_pallas_triangles(soup, cull=True),
                       **kw)
        np.testing.assert_allclose(np.asarray(r_cull.histogram),
                                   np.asarray(r_plain.histogram),
                                   rtol=1e-4, atol=1e-12)
