"""Differentiability hardening: gradients vs central finite differences on
small problems (SURVEY §7.10), and the rematerialized long-run scan."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayverb_tpu.core.geometry import Box
from wayverb_tpu.imagesource import exact
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.receivers import NodeReceiver
from wayverb_tpu.waveguide.sources import HardSource, impulse_signal

BOX = Box((0.0, 0.0, 0.0), (3.1, 2.6, 2.2))
SRC = (1.0, 1.2, 0.8)
RCV = (2.2, 1.3, 1.5)

FS = 3333.33
DX = grid_spacing(340.0, 1.0 / FS)


def central_diff(f, x, eps):
    return (f(x + eps) - f(x - eps)) / (2 * eps)


class TestImageSourceGradients:
    def test_absorption_gradient_matches_fd(self):
        def loss(a):
            imp = exact.find_impulses(BOX, SRC, RCV, jnp.full(8, a), 15.0)
            return jnp.sum(jnp.square(imp.volume))

        g = float(jax.grad(loss)(0.25))
        fd = float(central_diff(lambda a: float(loss(a)), 0.25, 1e-3))
        np.testing.assert_allclose(g, fd, rtol=2e-3)

    def test_source_position_gradient_matches_fd(self):
        def loss(x):
            src = jnp.asarray([x, 1.2, 0.8])
            imp = exact.find_impulses(BOX, src, RCV, jnp.full(8, 0.2), 12.0)
            # energy-weighted mean distance: smooth in source position
            w = jnp.square(imp.volume[:, 0])
            return jnp.sum(w * imp.distance) / jnp.sum(w)

        g = float(jax.grad(loss)(1.0))
        fd = float(central_diff(lambda x: float(loss(x)), 1.0, 1e-4))
        np.testing.assert_allclose(g, fd, rtol=5e-3)


class TestWaveguideGradients:
    def _setup(self):
        mesh = wgrun.shoebox_mesh(
            Box((0, 0, 0), (1.2, 1.3, 1.4)), np.full((1, 8), 0.3), DX, FS)
        desc = mesh.descriptor
        src = desc.flat_index(mesh.require_inside((0.6, 0.6, 0.4)))
        rcv = desc.flat_index(mesh.require_inside((0.6, 0.6, 1.0)))
        return mesh, src, rcv

    def test_boundary_gradient_matches_fd(self):
        mesh, src, rcv = self._setup()
        steps = 60

        def loss(scale):
            s = dataclasses.replace(mesh.structure,
                                    coef_b=mesh.structure.coef_b * scale)
            source = HardSource(node_idx=jnp.asarray(src, jnp.int32),
                                signal=impulse_signal(steps, 1.0))
            receiver = NodeReceiver(node_idx=jnp.asarray(rcv, jnp.int32))
            out = wgrun.run_waveguide(s, mesh.descriptor.dimensions,
                                      source, receiver, steps)
            return jnp.sum(jnp.square(out["outputs"]))

        loss64 = lambda x: float(loss(x))                  # noqa: E731
        g = float(jax.grad(loss)(1.0))
        fd = float(central_diff(loss64, 1.0, 1e-2))
        np.testing.assert_allclose(g, fd, rtol=0.05)

    def test_source_position_gradient_matches_fd(self):
        """d(IR energy)/d(source xyz) through the fused box solver, FD
        check (BASELINE: waveguide gradients w.r.t. source positions)."""
        from wayverb_tpu.waveguide.run import run_waveguide_box
        from wayverb_tpu.waveguide.sources import make_position_source
        mesh, _, rcv = self._setup()
        desc = mesh.descriptor
        steps = 60
        sig = np.zeros(steps, np.float32)
        sig[:6] = np.hanning(6)
        receiver = NodeReceiver(node_idx=jnp.asarray(rcv, jnp.int32))
        base = make_position_source(desc, (0.55, 0.63, 0.42), 2.5 * DX,
                                    sig, mesh.inside)

        def loss(pos):
            src = dataclasses.replace(base, position=pos)
            out = run_waveguide_box(mesh.structure, mesh.box_spec, src,
                                    receiver, steps)
            return jnp.sum(jnp.square(out["outputs"]))

        p0 = jnp.asarray((0.55, 0.63, 0.42), jnp.float32)
        g = np.asarray(jax.grad(loss)(p0))
        for a in range(3):
            e = jnp.zeros(3).at[a].set(2e-3)
            fd = (float(loss(p0 + e)) - float(loss(p0 - e))) / 4e-3
            # f32 central differences on an O(10^3) loss carry ~O(1) noise
            np.testing.assert_allclose(g[a], fd, rtol=2e-2, atol=5.0)

    def test_receiver_position_gradient_matches_fd(self):
        """d(IR energy)/d(receiver xyz) via the trilinear interpolating
        tap, FD check."""
        from wayverb_tpu.waveguide.receivers import \
            make_interpolated_receiver
        from wayverb_tpu.waveguide.run import run_waveguide_box
        mesh, src, _ = self._setup()
        steps = 60
        source = HardSource(node_idx=jnp.asarray(src, jnp.int32),
                            signal=impulse_signal(steps, 1.0))
        base = make_interpolated_receiver(
            mesh.descriptor, (0.62, 0.57, 1.03))

        def loss(pos):
            rec = dataclasses.replace(base, position=pos)
            out = run_waveguide_box(mesh.structure, mesh.box_spec, source,
                                    rec, steps)
            return jnp.sum(jnp.square(out["outputs"]))

        p0 = jnp.asarray((0.62, 0.57, 1.03), jnp.float32)
        g = np.asarray(jax.grad(loss)(p0))
        assert np.any(g != 0)
        for a in range(3):
            e = jnp.zeros(3).at[a].set(2e-3)
            fd = (float(loss(p0 + e)) - float(loss(p0 - e))) / 4e-3
            np.testing.assert_allclose(g[a], fd, rtol=5e-2, atol=1e-6)

    def test_checkpointed_scan_same_value_and_grad(self):
        mesh, src, rcv = self._setup()
        steps = 64

        def make_loss(checkpoint_every):
            def loss(scale):
                s = dataclasses.replace(
                    mesh.structure,
                    coef_b=mesh.structure.coef_b * scale)
                source = HardSource(node_idx=jnp.asarray(src, jnp.int32),
                                    signal=impulse_signal(steps, 1.0))
                receiver = NodeReceiver(node_idx=jnp.asarray(rcv, jnp.int32))
                out = wgrun.run_waveguide(
                    s, mesh.descriptor.dimensions, source, receiver, steps,
                    checkpoint_every=checkpoint_every)
                return jnp.sum(jnp.square(out["outputs"]))
            return loss

        v_plain, g_plain = jax.value_and_grad(make_loss(0))(1.0)
        v_ck, g_ck = jax.value_and_grad(make_loss(16))(1.0)
        np.testing.assert_allclose(float(v_ck), float(v_plain), rtol=1e-6)
        np.testing.assert_allclose(float(g_ck), float(g_plain), rtol=1e-5)
