"""Fused plane-boundary path: parity with the general gather path, Pallas
kernel parity in interpret mode, and hand-written VJP correctness."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.box_fused import (BoxSpec, fused_step,
                                             plane_boundary_step,
                                             spec_from_inside)
from wayverb_tpu.waveguide.descriptor import grid_spacing

ENV = Environment()
FS = 3333.33
DX = grid_spacing(ENV.speed_of_sound, 1.0 / FS)


def small_box_mesh(absorption=0.12):
    box = Box((0, 0, 0), (1.4, 1.6, 1.8))
    return box, wgrun.shoebox_mesh(box, np.full((1, 8), absorption), DX, FS)


class TestSpec:
    def test_spec_from_inside(self):
        _, mesh = small_box_mesh()
        spec = mesh.box_spec
        assert spec is not None
        idx = np.argwhere(mesh.inside)
        assert spec.ilo == tuple(idx.min(axis=0))
        assert spec.ihi == tuple(idx.max(axis=0))
        # plane coverage equals the compact boundary-node count
        n_plane = 0
        for a in range(3):
            ext = [spec.ihi[k] - spec.ilo[k] + 3 for k in range(3)]
            ext[a] = 1
            n_plane += 2 * int(np.prod(ext))
        # faces counted once, edges twice, corners three times:
        # n_plane = B + 2*edges + 3*... reconstruct directly instead
        dims_in = [spec.ihi[k] - spec.ilo[k] + 1 for k in range(3)]
        faces = 2 * (dims_in[0] * dims_in[1] + dims_in[1] * dims_in[2]
                     + dims_in[0] * dims_in[2])
        edges = 4 * sum(dims_in)
        corners = 8
        assert mesh.structure.num_boundary_nodes == faces + edges + corners

    def test_rejects_edge_touching_box(self):
        with pytest.raises(ValueError):
            BoxSpec(dims=(8, 8, 8), ilo=(1, 2, 2), ihi=(5, 5, 5),
                    face_surface=(0,) * 6)


class TestFusedParity:
    def test_matches_gather_path(self):
        """Whole-run parity: fused plane path vs compact gather path (which
        is itself parity-tested against the per-node naive oracle)."""
        box, mesh = small_box_mesh()
        assert mesh.box_spec is not None
        out_f = wgrun.canonical(mesh, (0.7, 0.8, 0.5), (0.7, 0.8, 1.3),
                                0.08, ENV)
        mesh_g = dataclasses.replace(mesh, box_spec=None, regions=None)
        out_g = wgrun.canonical(mesh_g, (0.7, 0.8, 0.5), (0.7, 0.8, 1.3),
                                0.08, ENV)
        np.testing.assert_allclose(np.asarray(out_f.pressure),
                                   np.asarray(out_g.pressure), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_f.intensity),
                                   np.asarray(out_g.intensity), atol=2e-5)
        assert bool(out_f.stable)

    def test_matches_region_path(self):
        box, mesh = small_box_mesh(absorption=0.3)
        out_f = wgrun.canonical(mesh, (0.7, 0.8, 0.5), (0.6, 0.9, 1.2),
                                0.05, ENV)
        mesh_r = dataclasses.replace(mesh, box_spec=None)
        out_r = wgrun.canonical(mesh_r, (0.7, 0.8, 0.5), (0.6, 0.9, 1.2),
                                0.05, ENV)
        np.testing.assert_allclose(np.asarray(out_f.pressure),
                                   np.asarray(out_r.pressure), atol=2e-5)

    def test_f64_state_close_to_f32(self):
        """Wider filter state must not change the physics (drift study for
        the reference's double-precision filter state mandate)."""
        from wayverb_tpu.waveguide.run import run_waveguide_box
        from wayverb_tpu.waveguide.receivers import NodeReceiver
        from wayverb_tpu.waveguide.sources import HardSource, impulse_signal
        box, mesh = small_box_mesh()
        desc = mesh.descriptor
        src = mesh.require_inside((0.7, 0.8, 0.5))
        rcv = mesh.require_inside((0.7, 0.8, 1.3))
        source = HardSource(
            node_idx=jnp.asarray(desc.flat_index(src), dtype=jnp.int32),
            signal=impulse_signal(400, 1.0))
        receiver = NodeReceiver(
            node_idx=jnp.asarray(desc.flat_index(rcv), dtype=jnp.int32))
        o32 = run_waveguide_box(mesh.structure, mesh.box_spec, source,
                                receiver, 400)
        o64 = run_waveguide_box(mesh.structure, mesh.box_spec, source,
                                receiver, 400, state_dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(o32["outputs"]),
                                   np.asarray(o64["outputs"]), atol=1e-5)


def _random_problem(rng, dims=(16, 16, 128)):
    inside = np.zeros(dims, dtype=bool)
    inside[2:-2, 2:-2, 2:-2] = True
    spec = spec_from_inside(inside)
    cur = jnp.asarray(rng.normal(size=dims).astype(np.float32))
    prev = jnp.asarray(rng.normal(size=dims).astype(np.float32))
    planes = tuple(
        jnp.asarray(rng.normal(size=spec.plane_shape(p)).astype(np.float32))
        for p in range(6))
    return spec, cur, prev, planes


def _inner_weights(rng, spec):
    return tuple(
        jnp.asarray(rng.normal(size=spec.plane_shape(p)).astype(np.float32))
        for p in range(6))


class TestPallasKernel:
    def test_interpret_matches_jnp(self, rng):
        from wayverb_tpu.waveguide.box_fused import _jnp_forward
        spec, cur, prev, planes = _random_problem(rng)
        geom = spec.geom_array()
        ref, ref_inner = _jnp_forward(geom, cur, prev, planes)
        out, inner = fused_step(spec, geom, cur, prev, planes,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        for got, want in zip(inner, ref_inner):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5)

    @pytest.mark.parametrize("interpret", [True, False])
    def test_custom_vjp_matches_jnp_autodiff(self, rng, interpret):
        """The hand VJP (writer-precedence plane masks + one-hot inner-plane
        placement) must equal autodiff of the pure-jnp forward, on both the
        interpreted Pallas backward and the jnp backward."""
        from wayverb_tpu.waveguide.box_fused import _jnp_forward
        spec, cur, prev, planes = _random_problem(rng)
        geom = spec.geom_array()
        g = jnp.asarray(rng.normal(size=cur.shape).astype(np.float32))
        wi = _inner_weights(rng, spec)

        def weighted(out):
            nxt, inner = out
            return jnp.sum(nxt * g) + sum(
                jnp.sum(w * p) for w, p in zip(wi, inner))

        def loss_custom(cur, prev, planes):
            return weighted(fused_step(spec, geom, cur, prev, planes,
                                       interpret=interpret))

        def loss_ref(cur, prev, planes):
            return weighted(_jnp_forward(geom, cur, prev, planes))

        gc = jax.grad(loss_custom, argnums=(0, 1, 2))(cur, prev, planes)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(cur, prev, planes)
        for got, ref in zip(jax.tree_util.tree_leaves(gc),
                            jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-4)


class TestPlaneStep:
    def test_quiescent_stays_quiescent(self, rng):
        spec, cur, prev, _ = _random_problem(rng)
        cur = jnp.zeros_like(cur)
        prev = jnp.zeros_like(prev)
        face_b = jnp.tile(jnp.asarray([[1.0, 0, 0, 0, 0, 0, 0]]), (6, 1))
        face_a = jnp.tile(jnp.asarray([[1.0, 0, 0, 0, 0, 0, 0]]), (6, 1))
        states = spec.initial_states(6)
        pplus, new_states = plane_boundary_step(cur, prev, states, spec,
                                                face_b, face_a)
        for p in pplus:
            assert float(jnp.abs(p).max()) == 0.0
        for s in new_states:
            assert float(jnp.abs(s).max()) == 0.0
