"""Region-based (gather-free) boundary path parity with the general path."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.box_boundary import Region, shoebox_regions
from wayverb_tpu.waveguide.descriptor import grid_spacing

ENV = Environment()
FS = 3333.33
DX = grid_spacing(ENV.speed_of_sound, 1.0 / FS)


class TestRegions:
    def test_shoebox_decomposition_counts(self):
        box = Box((0, 0, 0), (1.4, 1.6, 1.8))
        mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), DX, FS)
        regions = mesh.regions
        assert len(regions) == 26
        by_slots = {}
        total = 0
        for r in regions:
            by_slots.setdefault(len(r.inner_dirs), 0)
            by_slots[len(r.inner_dirs)] += 1
            total += int(np.prod(r.size))
        assert by_slots == {1: 6, 2: 12, 3: 8}
        # region nodes exactly cover the boundary nodes of the general path
        assert total == mesh.structure.num_boundary_nodes

    def test_region_surrounding_dirs(self):
        face = Region((0, 1, 1), (1, 4, 4), inner_dirs=(1,), slot_coefs=(0,))
        assert set(face.surrounding_dirs) == {2, 3, 4, 5}
        edge = Region((0, 0, 1), (1, 1, 4), inner_dirs=(1, 3),
                      slot_coefs=(0, 0))
        assert set(edge.surrounding_dirs) == {4, 5}
        corner = Region((0, 0, 0), (1, 1, 1), inner_dirs=(1, 3, 5),
                        slot_coefs=(0, 0, 0))
        assert corner.surrounding_dirs == ()

    def test_matches_gather_path(self):
        box = Box((0, 0, 0), (1.4, 1.6, 1.8))
        mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.12), DX, FS)
        assert mesh.regions is not None
        out_r = wgrun.canonical(mesh, (0.7, 0.8, 0.5), (0.7, 0.8, 1.3),
                                0.08, ENV)
        mesh_g = dataclasses.replace(mesh, regions=None)
        out_g = wgrun.canonical(mesh_g, (0.7, 0.8, 0.5), (0.7, 0.8, 1.3),
                                0.08, ENV)
        np.testing.assert_allclose(np.asarray(out_r.pressure),
                                   np.asarray(out_g.pressure), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_r.intensity),
                                   np.asarray(out_g.intensity), atol=2e-5)
