"""Checkpoint/resume: chunked execution must equal one continuous run, and
a snapshot written to disk must restore bit-exactly."""

import jax.numpy as jnp
import pytest
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


class TestCancellable:
    def test_cancel_mid_run_and_resume(self):
        """run_cancellable stops between chunks when keep_going flips,
        raises Cancelled with a RESUMABLE state, and resuming reproduces
        the uncancelled run exactly (reference keep_going contract,
        waveguide.h:80 / threaded_engine.cpp:55-57)."""
        from wayverb_tpu.waveguide.checkpoint import (Cancelled,
                                                      run_cancellable)
        mesh, source, receiver, steps = _setup()
        steps = 24
        full_state, full_out = run_cancellable(
            mesh, source, receiver, steps, keep_going=lambda: True,
            chunk=8)

        calls = {"n": 0}

        def kg():
            calls["n"] += 1
            return calls["n"] <= 2          # allow two chunks, then stop

        with pytest.raises(Cancelled) as exc:
            run_cancellable(mesh, source, receiver, steps, keep_going=kg,
                            chunk=8)
        part = exc.value
        assert part.state.step == 16
        np.testing.assert_allclose(
            np.asarray(part.outputs),
            np.asarray(full_out)[:16], atol=0)

        state, rest = run_cancellable(
            mesh, source, receiver, steps - part.state.step,
            keep_going=lambda: True, chunk=8, state=part.state)
        np.testing.assert_allclose(
            np.asarray(rest), np.asarray(full_out)[16:], atol=0)
        assert state.step == steps

    def test_progress_callback(self):
        from wayverb_tpu.waveguide.checkpoint import run_cancellable
        mesh, source, receiver, steps = _setup()
        steps = 24
        seen = []
        run_cancellable(mesh, source, receiver, steps,
                        keep_going=lambda: True, chunk=10,
                        on_progress=lambda s, t: seen.append((s, t)))
        assert seen[-1] == (steps, steps)
        assert [s for s, _ in seen] == [10, 20, 24]
