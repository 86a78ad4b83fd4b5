"""General (non-shoebox) mesh sharding: the fused weight-code solver under
shard_map must match the single-device solver; gradients must flow."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box, box_scene
from wayverb_tpu.parallel import sharding as ps
from wayverb_tpu.parallel.general_sharded import (
    canonical_general_sharded, run_waveguide_general_sharded)
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.receivers import NodeReceiver
from wayverb_tpu.waveguide.sources import (HardSource, impulse_signal,
                                           rectilinear_calibration_factor)

ENV = Environment()
FS = 3333.33
DX = grid_spacing(ENV.speed_of_sound, 1.0 / FS)


@pytest.fixture(scope="module")
def general_mesh():
    """Box geometry run through the GENERAL (scene-classified) path —
    mesh.box_spec is None, so this exercises weight_code machinery."""
    box = Box((0, 0, 0), (2.0, 2.5, 3.0))
    mesh = wgrun.compute_mesh(box_scene(box), np.full((1, 8), 0.1), DX, FS,
                              align=(8, 1, 1))
    assert mesh.box_spec is None
    return mesh


@pytest.fixture(scope="module")
def src_recv(general_mesh):
    desc = general_mesh.descriptor
    src_loc = general_mesh.require_inside((1.0, 1.2, 1.5))
    rcv_loc = general_mesh.require_inside((0.4, 1.9, 2.3))
    sig = impulse_signal(120, rectilinear_calibration_factor(DX, 400.0))
    return (HardSource(node_idx=jnp.asarray(desc.flat_index(src_loc)),
                       signal=sig),
            NodeReceiver(node_idx=jnp.asarray(desc.flat_index(rcv_loc))))


class TestGeneralSharded:
    @pytest.mark.parametrize("n_shards", [2, 8])
    def test_matches_single_device(self, general_mesh, src_recv, n_shards):
        mesh = general_mesh
        source, recv = src_recv
        dims = mesh.descriptor.dimensions
        assert dims[0] % n_shards == 0
        ref = np.asarray(wgrun.run_waveguide(
            mesh.structure, dims, source, recv, 120)["outputs"])
        out = run_waveguide_general_sharded(
            ps.make_device_mesh(n_shards), mesh.structure, dims, source,
            recv, 120)
        assert bool(out["stable"])
        np.testing.assert_allclose(np.asarray(out["outputs"]), ref,
                                   atol=5e-5)

    def test_gradient_matches_single(self, general_mesh, src_recv):
        mesh = general_mesh
        source, recv = src_recv
        dims = mesh.descriptor.dimensions
        devmesh = ps.make_device_mesh(4)

        def loss_sh(coef_b):
            s = dc.replace(mesh.structure, coef_b=coef_b)
            out = run_waveguide_general_sharded(devmesh, s, dims, source,
                                                recv, 60)
            return jnp.sum(out["outputs"] ** 2)

        def loss_si(coef_b):
            s = dc.replace(mesh.structure, coef_b=coef_b)
            out = wgrun.run_waveguide(s, dims, source, recv, 60)
            return jnp.sum(out["outputs"] ** 2)

        g_sh = np.asarray(jax.grad(loss_sh)(mesh.structure.coef_b))
        g_si = np.asarray(jax.grad(loss_si)(mesh.structure.coef_b))
        np.testing.assert_allclose(g_sh, g_si, rtol=1e-4, atol=1e-7)

    def test_canonical_general_sharded(self, general_mesh):
        mesh = general_mesh
        single = wgrun.canonical(mesh, (1.0, 1.2, 1.5), (1.0, 1.2, 2.3),
                                 0.03, ENV)
        shard = canonical_general_sharded(
            mesh, (1.0, 1.2, 1.5), (1.0, 1.2, 2.3), 0.03,
            ps.make_device_mesh(8), ENV)
        np.testing.assert_allclose(np.asarray(shard.pressure),
                                   np.asarray(single.pressure), atol=5e-5)
        np.testing.assert_allclose(np.asarray(shard.intensity),
                                   np.asarray(single.intensity), atol=5e-5)
        assert bool(shard.stable)
