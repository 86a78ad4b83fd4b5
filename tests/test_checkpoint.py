"""Checkpoint/resume: chunked execution must equal one continuous run, and
a snapshot written to disk must restore bit-exactly."""

import jax.numpy as jnp
import numpy as np

from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box
from wayverb_tpu.waveguide import checkpoint as ck
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.receivers import NodeReceiver
from wayverb_tpu.waveguide.sources import HardSource, impulse_signal

ENV = Environment()
FS = 3333.33
DX = grid_spacing(ENV.speed_of_sound, 1.0 / FS)


def _setup():
    box = Box((0, 0, 0), (1.4, 1.6, 1.8))
    mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), DX, FS)
    desc = mesh.descriptor
    src = desc.flat_index(mesh.require_inside((0.7, 0.8, 0.5)))
    rcv = desc.flat_index(mesh.require_inside((0.7, 0.8, 1.3)))
    steps = 90
    source = HardSource(node_idx=jnp.asarray(src, dtype=jnp.int32),
                        signal=impulse_signal(steps, 1.0))
    receiver = NodeReceiver(node_idx=jnp.asarray(rcv, dtype=jnp.int32))
    return mesh, source, receiver, steps


def test_chunked_equals_continuous():
    mesh, source, receiver, steps = _setup()
    ref = np.asarray(
        wgrun.execute(mesh, source, receiver, steps)["outputs"])

    state = ck.initial_state(mesh, receiver)
    pieces = []
    for chunk in (30, 30, 30):
        state, out = ck.run_chunk(mesh, source, receiver, state, chunk)
        pieces.append(np.asarray(out))
    chunked = np.concatenate(pieces)
    np.testing.assert_array_equal(chunked, ref)
    assert bool(state.stable)


def test_save_load_roundtrip(tmp_path):
    mesh, source, receiver, steps = _setup()
    state = ck.initial_state(mesh, receiver)
    state, out1 = ck.run_chunk(mesh, source, receiver, state, 40)

    path = str(tmp_path / "snap.npz")
    ck.save_state(path, state)
    restored = ck.load_state(path, mesh, receiver)
    assert restored.step == 40

    state_b, out2a = ck.run_chunk(mesh, source, receiver, state, 50)
    restored, out2b = ck.run_chunk(mesh, source, receiver, restored, 50)
    np.testing.assert_array_equal(np.asarray(out2a), np.asarray(out2b))
