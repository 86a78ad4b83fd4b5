"""Multi-material shoebox: per-wall surface assignment with 2D/3D
inheritance (reference boundary_coefficient_program.cpp:360-430) and
cross-solver parity."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box, box_scene
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.descriptor import grid_spacing

ENV = Environment()
FS = 3333.33
DX = grid_spacing(ENV.speed_of_sound, 1.0 / FS)

# soft x/y walls (material 0), hard z walls (material 1)
ABSORPTION = np.stack([np.full(8, 0.06), np.full(8, 0.5)])
PER_WALL = (0, 0, 0, 0, 1, 1)


def two_material_mesh():
    box = Box((0, 0, 0), (1.4, 1.6, 1.8))
    soup = box_scene(box, per_wall_surfaces=PER_WALL)
    return box, wgrun.compute_mesh(soup, ABSORPTION, DX, FS,
                                   scene_box=box)


class TestAssignment:
    def test_face_surfaces(self):
        _, mesh = two_material_mesh()
        assert mesh.box_spec.face_surface == PER_WALL

    def test_edge_nodes_inherit_per_slot(self):
        """An edge node between the x-lo and z-lo walls must carry BOTH
        materials: its x slot the x wall's, its z slot the z wall's."""
        _, mesh = two_material_mesh()
        s = mesh.structure
        spec = mesh.box_spec
        dims = mesh.descriptor.dimensions
        node = np.asarray(s.b_node_idx)
        x, rem = np.divmod(node, dims[1] * dims[2])
        y, z = np.divmod(rem, dims[2])
        mask = np.asarray(s.b_slot_mask)
        coef = np.asarray(s.b_slot_coef)
        nslots = (mask > 0).sum(axis=1)

        blo = tuple(spec.ilo[a] - 1 for a in range(3))
        on_x_lo = x == blo[0]
        on_z_lo = z == blo[2]
        inner_y = (y >= spec.ilo[1]) & (y <= spec.ihi[1])
        edge = on_x_lo & on_z_lo & inner_y & (nslots == 2)
        assert edge.sum() > 0
        coef_edge = coef[edge]
        mask_edge = mask[edge] > 0
        # each edge node carries exactly one slot of each material
        mats = [sorted(coef_edge[i][mask_edge[i]].tolist())
                for i in range(edge.sum())]
        assert all(m == [0, 1] for m in mats)

        # pure x-lo FACE nodes carry material 0 only; z-lo face material 1
        face_x = on_x_lo & ~on_z_lo & (x == blo[0]) & (nslots == 1) & \
            inner_y & (z >= spec.ilo[2]) & (z <= spec.ihi[2])
        assert face_x.sum() > 0
        assert np.all(coef[face_x][mask[face_x] > 0] == 0)
        face_z = on_z_lo & ~on_x_lo & (nslots == 1) & inner_y & \
            (x >= spec.ilo[0]) & (x <= spec.ihi[0])
        assert np.all(coef[face_z][mask[face_z] > 0] == 1)


class TestParity:
    def test_fused_matches_gather_two_materials(self):
        """The fused path (per-face surfaces) and the gather path (per-node
        inherited slots) are independent material plumbing — whole-run
        parity on a 2-material box validates the inheritance."""
        _, mesh = two_material_mesh()
        out_f = wgrun.canonical(mesh, (0.7, 0.8, 0.5), (0.7, 0.8, 1.3),
                                0.06, ENV)
        mesh_g = dataclasses.replace(mesh, box_spec=None, regions=None)
        out_g = wgrun.canonical(mesh_g, (0.7, 0.8, 0.5), (0.7, 0.8, 1.3),
                                0.06, ENV)
        np.testing.assert_allclose(np.asarray(out_f.pressure),
                                   np.asarray(out_g.pressure),
                                   rtol=1e-5, atol=2e-5)
        assert bool(out_f.stable)

    def test_hard_wall_reflects_more(self):
        """Physics: swapping the z walls from soft to hard must raise the
        late energy of a z-axis reflection path."""
        box = Box((0, 0, 0), (1.4, 1.6, 1.8))
        out = {}
        for name, per_wall in (("soft", (0,) * 6), ("hard", PER_WALL)):
            soup = box_scene(box, per_wall_surfaces=per_wall)
            mesh = wgrun.compute_mesh(soup, ABSORPTION, DX, FS,
                                      scene_box=box)
            # materials: 0 = abs 0.06 (more reflective), 1 = abs 0.5
            r = wgrun.canonical(mesh, (0.7, 0.8, 0.9), (0.7, 0.8, 1.2),
                                0.1, ENV)
            p = np.asarray(r.pressure)
            out[name] = float(np.square(p[len(p) // 2:]).sum())
        assert out["soft"] > 2.0 * out["hard"]
