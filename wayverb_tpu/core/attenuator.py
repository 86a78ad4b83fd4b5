"""Receiver capsule models: omni/null, polar-pattern microphone, HRTF.

All attenuation functions broadcast over a batch of incident vectors and are
differentiable.

Parity: reference ``core/attenuator/microphone.cpp:18-25`` (gain =
(1-s) + s·cosθ), ``core/attenuator/hrtf.cpp:119-139`` (az/el table lookup of
2-channel 8-band energies; ear offset ±radius along the local x axis),
``core/attenuator/null.h``.

The reference bakes the IRCAM Listen HRIR database into a header via its
``hrtf/cmd`` codegen.  We do not copy that data; instead the default table is
generated from a spherical-head shadowing model with the same shape/API
(``wayverb_tpu.core.hrtf``), and ``tools/bake_hrtf.py`` can bake a table from
any HRIR WAV set.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from wayverb_tpu.core.orientation import Orientation, angle_lut_indices


@dataclasses.dataclass(frozen=True)
class Null:
    """Omnidirectional: unit gain."""

    def attenuation(self, incident):
        return jnp.ones(incident.shape[:-1], dtype=incident.dtype)


@dataclasses.dataclass(frozen=True)
class Microphone:
    """First-order polar pattern: shape 0 = omni, 0.5 = cardioid, 1 = fig-8."""

    orientation: Orientation = Orientation()
    shape: float = 0.0

    def attenuation(self, incident):
        """Gain for incident direction vectors (..., 3) (toward the event)."""
        length = jnp.linalg.norm(incident, axis=-1)
        unit = incident / jnp.maximum(length[..., None], 1e-20)
        pointing = self.orientation.matrix()[2]
        cos = jnp.sum(unit * pointing, axis=-1)
        gain = (1.0 - self.shape) + self.shape * cos
        return jnp.where(length > 0, gain, 0.0)


@dataclasses.dataclass(frozen=True)
class Hrtf:
    """Head-related capsule: per-direction 8-band energies, two ears.

    ``table``: (az, el, 2, bands) energy table; ``channel``: 0=left 1=right;
    ``radius``: ear offset from head centre in metres.
    """

    orientation: Orientation = Orientation()
    channel: int = 0
    radius: float = 0.1
    table: Any = None

    def _table(self):
        if self.table is not None:
            return self.table
        from wayverb_tpu.core.hrtf import default_hrtf_table
        return default_hrtf_table()

    def attenuation(self, incident):
        """(..., bands) per-band gains for incident vectors (..., 3)."""
        table = self._table()
        num_az, num_el = table.shape[0], table.shape[1]
        length = jnp.linalg.norm(incident, axis=-1)
        unit = incident / jnp.maximum(length[..., None], 1e-20)
        local = self.orientation.transform(unit)
        az, el = angle_lut_indices(local, num_az, num_el)
        gains = table[az, el, self.channel]
        return jnp.where(length[..., None] > 0, gains, 0.0)

    def ear_position(self, base_position):
        offset = jnp.where(self.channel == 0, -self.radius, self.radius)
        x_axis = self.orientation.matrix()[0]
        return jnp.asarray(base_position) + offset * x_axis
