"""Multi-chip tests on the 8-device virtual CPU mesh: sharded FDTD must
match the single-device solver exactly; data-parallel rays must match the
energy normalization; gradients must flow through the sharded scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box, box_scene
from wayverb_tpu.core.surfaces import Surface
from wayverb_tpu.parallel import sharding as ps
from wayverb_tpu.raytracer import tracer
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.receivers import NodeReceiver
from wayverb_tpu.waveguide.sources import (HardSource, impulse_signal,
                                           rectilinear_calibration_factor)

ENV = Environment()
FS = 3333.33
DX = grid_spacing(ENV.speed_of_sound, 1.0 / FS)


@pytest.fixture(scope="module")
def small_mesh():
    box = Box((0, 0, 0), (2.0, 2.5, 3.0))
    return wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), DX, FS)


def flat_padded(loc, padded):
    return int(np.ravel_multi_index(tuple(loc), padded))


class TestShardedWaveguide:
    @pytest.mark.parametrize("n_shards", [2, 4, 8])
    def test_matches_single_device(self, small_mesh, n_shards):
        mesh = small_mesh
        desc = mesh.descriptor
        dims = desc.dimensions
        src_loc = mesh.require_inside((1.0, 1.2, 1.5))
        rcv_loc = mesh.require_inside((1.0, 1.2, 2.3))
        num_steps = 120
        sig = impulse_signal(
            num_steps, rectilinear_calibration_factor(DX, 400.0))

        source = HardSource(node_idx=jnp.asarray(desc.flat_index(src_loc)),
                            signal=sig)
        recv = NodeReceiver(node_idx=jnp.asarray(desc.flat_index(rcv_loc)))
        ref = np.asarray(wgrun.run_waveguide(
            mesh.structure, dims, source, recv, num_steps)["outputs"])

        devmesh = ps.make_device_mesh(n_shards)
        sharded, padded = ps.shard_structure(mesh.structure, dims, n_shards)
        out = np.asarray(ps.sharded_run_waveguide(
            devmesh, "x", sharded, padded,
            flat_padded(src_loc, padded), flat_padded(rcv_loc, padded),
            sig, num_steps))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_gradient_through_sharded_scan(self, small_mesh):
        """Adjoint through halo exchange: d loss / d coef_b is finite."""
        mesh = small_mesh
        desc = mesh.descriptor
        dims = desc.dimensions
        src_loc = mesh.require_inside((1.0, 1.2, 1.5))
        rcv_loc = mesh.require_inside((1.0, 1.2, 2.3))
        sig = impulse_signal(40, 1.0)
        devmesh = ps.make_device_mesh(4)
        sharded, padded = ps.shard_structure(mesh.structure, dims, 4)

        import dataclasses

        def loss(scale):
            s2 = dataclasses.replace(sharded, coef_b=sharded.coef_b * scale)
            out = ps.sharded_run_waveguide(
                devmesh, "x", s2, padded,
                flat_padded(src_loc, padded), flat_padded(rcv_loc, padded),
                sig, 40)
            return jnp.sum(jnp.square(out))

        g = jax.grad(loss)(1.0)
        assert np.isfinite(g) and g != 0.0


class TestShardedRays:
    def test_dp_trace_matches_energy_scale(self):
        """Sharded trace total direct energy ≈ single-device trace."""
        box = Box((0, 0, 0), (5.56, 3.97, 2.81))
        soup = box_scene(box)
        surf = Surface(absorption=jnp.full((1, 8), 1.0),
                       scattering=jnp.full((1, 8), 0.0))
        src, rcv = (2.09, 2.12, 2.12), (2.09, 3.08, 0.96)
        devmesh = ps.make_device_mesh(8)
        hist = ps.sharded_trace(
            devmesh, "x", soup, surf, src, rcv, jax.random.PRNGKey(0),
            rays_per_device=8192, depth=1, max_time=0.2)
        total = float(jnp.sum(hist))
        r = np.linalg.norm(np.subtract(src, rcv))
        expected = 8 * 1.0 / (4 * np.pi * r * r)  # 8 bands, unit per band
        np.testing.assert_allclose(total, expected, rtol=0.3)
