"""HRTF energy tables.

The reference ships per-direction 2-channel 8-band energies baked from the
IRCAM Listen database (``src/hrtf/cmd/main.cpp``; table layout
``core/src/attenuator/hrtf.cpp:68-85``).  We do not copy that data.  The
default table here is synthesized from a spherical-head model (Woodworth ITD
geometry + first-order head-shadow lowpass per band), which reproduces the
qualitative ILD behavior the renderer needs; ``tools/bake_hrtf.py`` produces
a drop-in table from any measured HRIR set.

Table shape: (NUM_AZ=24, NUM_EL=9, 2 channels, 8 bands), energies in [0, 1].
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from wayverb_tpu.signal.multiband import band_centres

NUM_AZ = 24
NUM_EL = 9
NUM_CHANNELS = 2
NUM_BANDS = 8

HEAD_RADIUS = 0.0875  # metres
SPEED_OF_SOUND = 340.0


@functools.lru_cache(maxsize=1)
def _default_table_np() -> np.ndarray:
    centres = np.asarray(band_centres(NUM_BANDS), dtype=np.float64)
    table = np.zeros((NUM_AZ, NUM_EL, NUM_CHANNELS, NUM_BANDS))

    az_angles = 2.0 * np.pi * np.arange(NUM_AZ) / NUM_AZ
    el_angles = (np.arange(NUM_EL) - NUM_EL // 2) * (np.pi / NUM_EL)

    for ai, az in enumerate(az_angles):
        for ei, el in enumerate(el_angles):
            # incident unit vector in head coordinates (x=right, y=up,
            # z=front), matching orientation.angle_lut_indices conventions
            d = np.array([
                np.cos(el) * np.sin(az),
                np.sin(el),
                np.cos(el) * np.cos(az),
            ])
            for ch, ear_x in ((0, -1.0), (1, 1.0)):
                ear = np.array([ear_x, 0.0, 0.0])
                # cos of angle between incidence and the ear axis: 1 =
                # ipsilateral (facing the ear), -1 = fully shadowed
                c = float(np.dot(d, ear))
                # spherical-head shadow: first-order lowpass whose cutoff
                # drops as the source moves contralateral (brown & duda 1998
                # style alpha weighting)
                alpha = 1.0 + c  # 2 facing the ear, 0 opposite
                f0 = SPEED_OF_SOUND / (2.0 * np.pi * HEAD_RADIUS)  # ~618 Hz
                w = centres / f0
                # one-pole shelving response of the duda head model:
                # H(f) = sqrt((1 + (alpha w)^2) / (1 + w^2))
                mag = np.sqrt((1.0 + (alpha * w) ** 2) / (1.0 + (2.0 * w) ** 2)
                              ) * 2.0 / (1.0 + alpha / 2.0)
                table[ai, ei, ch] = np.clip(mag, 0.0, 1.5)
    return table.astype(np.float32)


def default_hrtf_table():
    """(NUM_AZ, NUM_EL, 2, 8) jnp energy table from the spherical-head model."""
    return jnp.asarray(_default_table_np())


def table_from_energies(energies) -> jnp.ndarray:
    """Validate/convert a baked (az, el, 2, bands) table (from tools/bake_hrtf)."""
    t = jnp.asarray(energies, dtype=jnp.float32)
    if t.ndim != 4 or t.shape[2] != NUM_CHANNELS:
        raise ValueError(f"expected (az, el, 2, bands) table, got {t.shape}")
    return t
