"""True multi-process (multi-host analogue) run of the sharded fused
waveguide: two processes × four virtual CPU devices, jax.distributed, one
global 8-device mesh — collectives cross the process boundary the way DCN
traffic does on a pod.  Output must match the single-device solver."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from wayverb_tpu.parallel import distributed as dist
dist.initialize(f"127.0.0.1:{port}", nprocs, proc_id)
assert jax.device_count() == 4 * nprocs, jax.device_count()

import jax.numpy as jnp
import numpy as np
from wayverb_tpu.core.geometry import Box, box_scene
from wayverb_tpu.parallel import box_sharded as bs
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.receivers import NodeReceiver
from wayverb_tpu.waveguide.sources import HardSource, impulse_signal

FS = 3333.33
DX = grid_spacing(340.0, 1.0 / FS)
box = Box((0, 0, 0), (1.6, 1.5, 1.7))
mesh = wgrun.compute_mesh(box_scene(box), np.full((1, 8), 0.1), DX, FS,
                          scene_box=box, align=(8, 1, 1))
desc = mesh.descriptor
src = mesh.require_inside((0.8, 0.7, 0.5))
rcv = mesh.require_inside((0.8, 0.7, 1.2))
steps = 60
source = HardSource(node_idx=jnp.asarray(desc.flat_index(src)),
                    signal=impulse_signal(steps, 1.0))
recv = NodeReceiver(node_idx=jnp.asarray(desc.flat_index(rcv)))

gmesh = dist.global_device_mesh()
out = bs.run_waveguide_box_sharded(gmesh, mesh.structure, mesh.box_spec,
                                   source, recv, steps)
trace = np.asarray(out["outputs"])
assert bool(out["stable"])
if dist.is_coordinator():
    ref = np.asarray(wgrun.run_waveguide_box(
        mesh.structure, mesh.box_spec, source, recv, steps,
        kernel_inject=False)["outputs"])
    np.testing.assert_allclose(trace, ref, atol=1e-5)
    print("MULTIHOST_OK")
"""


@pytest.mark.slow
def test_two_process_sharded_matches_single(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ}
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # the worker script lives in tmp_path, so the repo root must reach
    # sys.path explicitly (python puts the SCRIPT's dir there, not cwd)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo_root)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert procs[0].returncode == 0, outs[0][-2000:]
    assert procs[1].returncode == 0, outs[1][-2000:]
    assert "MULTIHOST_OK" in outs[0], outs[0][-2000:]
