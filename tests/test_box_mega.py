"""VMEM-resident mega-kernel: plane-step oracle parity, whole-run parity
(interpret mode), custom-VJP gradient parity, tap replay."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box, box_scene
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide import boundary as bdry
from wayverb_tpu.waveguide.box_fused import (plane_boundary_step_planes,
                                             stacked_plane_shape)
from wayverb_tpu.waveguide.box_mega import (mega_canonical_loss_fn,
                                            plane_step_natural,
                                            replay_taps,
                                            run_waveguide_box_mega)
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.receivers import (NodeReceiver,
                                             make_directional_receiver)
from wayverb_tpu.waveguide.sources import (HardSource, SoftSource,
                                           impulse_signal,
                                           rectilinear_calibration_factor)

ENV = Environment()
FS = 3333.33
DX = grid_spacing(ENV.speed_of_sound, 1.0 / FS)


@pytest.fixture(scope="module")
def small_mesh():
    box = Box((0, 0, 0), (1.4, 1.6, 1.8))
    mesh = wgrun.compute_mesh(box_scene(box), np.full((1, 8), 0.12), DX,
                              FS, scene_box=box, align=(8, 8, 128))
    return box, mesh


class TestPlaneStepOracle:
    def test_matches_stacked_update(self, small_mesh):
        """plane_step_natural ≡ box_fused.plane_boundary_step_planes (the
        round-3 oracle) on random plane states."""
        _, mesh = small_mesh
        spec = mesh.box_spec
        order = mesh.structure.filter_order
        rng = np.random.RandomState(0)
        mk = lambda s: jnp.asarray(rng.randn(*s).astype(np.float32))  # noqa
        pl6 = tuple(mk(spec.plane_shape(p)) for p in range(6))
        in6 = tuple(mk(spec.plane_shape(p)) for p in range(6))
        pr6 = tuple(mk(spec.plane_shape(p)) for p in range(6))
        st6_last = tuple(mk(spec.plane_shape(p) + (order,))
                         for p in range(6))
        face_idx = np.asarray(spec.face_surface)
        fb = jnp.asarray(mesh.structure.coef_b)[face_idx]
        fa = jnp.asarray(mesh.structure.coef_a)[face_idx]

        ref_p, ref_st = plane_boundary_step_planes(pl6, in6, pr6,
                                                   st6_last, spec, fb, fa)
        st6 = tuple(jnp.moveaxis(s, -1, 0) for s in st6_last)
        got_p, got_st = plane_step_natural(spec, pl6, in6, pr6, st6,
                                           fb, fa, kernel=False)
        for p in range(6):
            np.testing.assert_allclose(np.asarray(got_p[p]),
                                       np.asarray(ref_p[p]), atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(jnp.moveaxis(got_st[p], 0, -1)),
                np.asarray(ref_st[p]), atol=1e-5)


class TestMegaParity:
    def test_whole_run_matches_fused(self, small_mesh):
        _, mesh = small_mesh
        desc = mesh.descriptor
        steps = 16
        src_loc = mesh.require_inside((0.7, 0.8, 0.5))
        rcv_loc = mesh.require_inside((0.7, 0.8, 1.3))
        amp = rectilinear_calibration_factor(desc.spacing,
                                             ENV.acoustic_impedance)
        source = HardSource(
            node_idx=jnp.asarray(desc.flat_index(src_loc),
                                 dtype=jnp.int32),
            signal=impulse_signal(steps, amp))
        fs = desc.sample_rate(ENV.speed_of_sound)
        receiver = make_directional_receiver(desc, fs, ENV.ambient_density,
                                             desc.position(rcv_loc))
        ref = wgrun.run_waveguide_box(mesh.structure, mesh.box_spec,
                                      source, receiver, steps)
        mega = run_waveguide_box_mega(mesh.structure, mesh.box_spec,
                                      source, receiver, steps, chunk=4,
                                      interpret=True)
        for a, b in zip(ref["outputs"], mega["outputs"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)
        assert bool(mega["stable"])

    def test_padded_tail_and_soft_source(self, small_mesh):
        """num_steps not a chunk multiple; soft source."""
        _, mesh = small_mesh
        desc = mesh.descriptor
        steps = 11
        src_loc = mesh.require_inside((0.7, 0.8, 0.5))
        rcv_loc = mesh.require_inside((0.7, 0.8, 1.3))
        source = SoftSource(
            node_idx=jnp.asarray(desc.flat_index(src_loc),
                                 dtype=jnp.int32),
            signal=impulse_signal(steps, 2.0))
        receiver = NodeReceiver(
            node_idx=jnp.asarray(desc.flat_index(rcv_loc),
                                 dtype=jnp.int32))
        ref = wgrun.run_waveguide_box(mesh.structure, mesh.box_spec,
                                      source, receiver, steps)
        mega = run_waveguide_box_mega(mesh.structure, mesh.box_spec,
                                      source, receiver, steps, chunk=4,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(ref["outputs"]),
                                   np.asarray(mega["outputs"]), atol=2e-5)


class TestInnerPlaneSource:
    @pytest.mark.parametrize("axis", [0, 1, 2])
    @pytest.mark.parametrize("side", [0, 1])
    def test_source_on_inner_plane(self, small_mesh, axis, side):
        """A source sitting ON an inner boundary plane must be mirrored
        into the carried plane scratch (_patch_ins).  Regression: the z
        planes have V = Y < Vmax and a full-width scratch read broadcast
        against the V-wide lane mask, crashing at trace time (ADVICE r4,
        medium)."""
        _, mesh = small_mesh
        desc = mesh.descriptor
        spec = mesh.box_spec
        steps = 10
        loc = [(spec.ilo[a] + spec.ihi[a]) // 2 for a in range(3)]
        loc[axis] = spec.ilo[axis] if side == 0 else spec.ihi[axis]
        rcv = [(spec.ilo[a] + spec.ihi[a]) // 2 for a in range(3)]
        rcv[2] += 2
        source = SoftSource(
            node_idx=jnp.asarray(desc.flat_index(tuple(loc)),
                                 dtype=jnp.int32),
            signal=impulse_signal(steps, 1.5))
        receiver = NodeReceiver(
            node_idx=jnp.asarray(desc.flat_index(tuple(rcv)),
                                 dtype=jnp.int32))
        ref = wgrun.run_waveguide_box(mesh.structure, mesh.box_spec,
                                      source, receiver, steps)
        mega = run_waveguide_box_mega(mesh.structure, mesh.box_spec,
                                      source, receiver, steps, chunk=4,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(ref["outputs"]),
                                   np.asarray(mega["outputs"]), atol=2e-5)


class TestMegaGradients:
    def test_gradients_match_fused_path(self, small_mesh):
        """coef_b / coef_a / signal grads through the chunk custom VJP
        match the fused path's XLA-injection gradients (themselves
        FD-verified in test_gradients.py)."""
        _, mesh = small_mesh
        desc = mesh.descriptor
        spec = mesh.box_spec
        steps = 12
        src_loc = mesh.require_inside((0.7, 0.8, 0.5))
        rcv_loc = mesh.require_inside((0.7, 0.8, 1.3))
        sig0 = impulse_signal(steps, 3.0)
        node = jnp.asarray(desc.flat_index(src_loc), dtype=jnp.int32)
        receiver = NodeReceiver(
            node_idx=jnp.asarray(desc.flat_index(rcv_loc),
                                 dtype=jnp.int32))
        source = HardSource(node_idx=node, signal=sig0)
        face_idx = np.asarray(spec.face_surface)
        f = mega_canonical_loss_fn(mesh.structure, spec, source, receiver,
                                   steps, chunk=4, interpret=True)

        def mega_loss(coef_b, coef_a, sig):
            taps, _ = f(coef_b[face_idx], coef_a[face_idx], sig)
            return jnp.sum(taps ** 2)

        def old_loss(coef_b, coef_a, sig):
            structure = dc.replace(mesh.structure, coef_b=coef_b,
                                   coef_a=coef_a)
            src = HardSource(node_idx=node, signal=sig)
            out = wgrun.run_waveguide_box(structure, spec, src, receiver,
                                          steps, kernel_inject=False)
            return jnp.sum(out["outputs"] ** 2)

        args = (mesh.structure.coef_b, mesh.structure.coef_a, sig0)
        gm = jax.grad(mega_loss, argnums=(0, 1, 2))(*args)
        go = jax.grad(old_loss, argnums=(0, 1, 2))(*args)
        for a, b in zip(gm, go):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.max(np.abs(b)) + 1e-30
            assert np.max(np.abs(a - b)) / scale < 1e-4


class TestReplay:
    def test_replay_matches_direct_tap(self, small_mesh):
        _, mesh = small_mesh
        desc = mesh.descriptor
        rcv_loc = mesh.require_inside((0.7, 0.8, 1.3))
        fs = desc.sample_rate(ENV.speed_of_sound)
        receiver = make_directional_receiver(desc, fs, ENV.ambient_density,
                                             desc.position(rcv_loc))
        nodes = np.asarray(receiver.tap_nodes())
        rng = np.random.RandomState(1)
        fields = rng.randn(5, desc.num_nodes).astype(np.float32)
        taps = jnp.asarray(fields[:, nodes])
        out = replay_taps(receiver, taps)
        state = receiver.init_state()
        for t in range(5):
            state, (intensity, p) = receiver.tap(jnp.asarray(fields[t]),
                                                 state)
            np.testing.assert_allclose(np.asarray(out[0][t]),
                                       np.asarray(intensity), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(out[1][t]),
                                       np.asarray(p), rtol=1e-6)
