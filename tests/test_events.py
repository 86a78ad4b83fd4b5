"""Event hub, phase timing, and field-snapshot streaming."""

import numpy as np
import jax.numpy as jnp

from wayverb_tpu.core.geometry import Box
from wayverb_tpu.utils.events import (EventHub, PhaseTimer,
                                      iter_pressure_fields, STATES)
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.receivers import NodeReceiver
from wayverb_tpu.waveguide.sources import HardSource, impulse_signal


def test_event_hub_connect_fire_disconnect():
    hub = EventHub()
    got = []
    fn = hub.connect("engine_state_changed", lambda s, p: got.append((s, p)))
    hub.fire("engine_state_changed", STATES[2], 0.5)
    hub.disconnect("engine_state_changed", fn)
    hub.fire("engine_state_changed", STATES[3], 0.7)
    assert got == [("starting_raytracer", 0.5)]


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("setup"):
        pass
    with t.phase("run"):
        pass
    with t.phase("run"):
        pass
    assert t.counts == {"setup": 1, "run": 2}
    assert "run" in t.report()


def test_field_snapshot_stream():
    fs = 3333.33
    dx = grid_spacing(340.0, 1.0 / fs)
    mesh = wgrun.shoebox_mesh(Box((0, 0, 0), (1.2, 1.3, 1.4)),
                              np.full((1, 8), 0.1), dx, fs)
    desc = mesh.descriptor
    src = desc.flat_index(mesh.require_inside((0.6, 0.6, 0.4)))
    rcv = desc.flat_index(mesh.require_inside((0.6, 0.6, 1.0)))
    steps = 24
    source = HardSource(node_idx=jnp.asarray(src, jnp.int32),
                        signal=impulse_signal(steps, 1.0))
    receiver = NodeReceiver(node_idx=jnp.asarray(rcv, jnp.int32))

    snaps = list(iter_pressure_fields(mesh, source, receiver, steps,
                                      every=8))
    assert [s for s, _, _ in snaps] == [8, 16, 24]
    for _, field, _ in snaps:
        assert field.shape == desc.dimensions
        assert bool(jnp.any(field != 0))  # the wavefront is visible
