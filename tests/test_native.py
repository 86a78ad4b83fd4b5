"""Native C++ setup-runtime tests (skipped when g++/lib unavailable)."""

import numpy as np
import pytest

from wayverb_tpu.core.geometry import Box, box_scene
from wayverb_tpu.utils import native

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


class TestNative:
    def test_classify_inside_box(self, rng):
        soup = box_scene(Box((0, 0, 0), (4.0, 3.0, 6.0)))
        pts = rng.uniform(-1, 7, (5000, 3))
        inside = native.classify_inside(
            pts, np.asarray(soup.vertices), np.asarray(soup.triangles))
        expected = np.all((pts > [0, 0, 0]) & (pts < [4, 3, 6]), axis=1)
        assert (inside == expected).mean() > 0.999

    def test_classify_matches_jax_path(self, rng):
        import jax.numpy as jnp
        from wayverb_tpu.core.geometry import points_inside
        soup = box_scene(Box((0, 0, 0), (2.0, 2.0, 2.0)))
        pts = rng.uniform(-0.5, 2.5, (500, 3))
        native_inside = native.classify_inside(
            pts, np.asarray(soup.vertices), np.asarray(soup.triangles))
        jax_inside = np.asarray(points_inside(
            jnp.asarray(pts, dtype=jnp.float32), soup))
        assert (native_inside == jax_inside).mean() > 0.995

    def test_closest_surface_per_wall(self):
        """Box with per-triangle surface = triangle index: points near each
        wall pick a triangle of that wall."""
        import jax.numpy as jnp
        from wayverb_tpu.core.geometry import TriangleSoup
        soup = box_scene(Box((0, 0, 0), (2.0, 2.0, 2.0)))
        soup = TriangleSoup(soup.vertices, soup.triangles,
                            jnp.arange(soup.num_triangles, dtype=jnp.int32))
        corners = np.asarray(soup.corners())
        centroids = corners.mean(axis=1)
        got = native.closest_triangle_surface(
            centroids, np.asarray(soup.vertices),
            np.asarray(soup.triangles), np.asarray(soup.surfaces))
        np.testing.assert_array_equal(got, np.arange(soup.num_triangles))
