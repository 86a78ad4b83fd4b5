"""Hybrid combination: crossover the waveguide (low) and geometric (high)
outputs, then window out pre-arrival junk.

Parity: reference ``combined/postprocess.h:33-136`` — zero-phase
lopass/hipass pair at the waveguide's top frequency with width 0.2, sum,
then a rising half-Hann window up to the direct arrival time.
"""

from __future__ import annotations

import jax.numpy as jnp

from wayverb_tpu.signal.multiband import (apply_zero_phase_magnitude,
                                          compute_hipass_magnitude,
                                          compute_lopass_magnitude)
from wayverb_tpu.signal.windows import left_hanning

CROSSOVER_WIDTH = 0.2  # "wider = more natural-sounding"


def crossover_filter(low_signal, high_signal, cutoff_norm: float,
                     width: float = CROSSOVER_WIDTH):
    """Zero-phase complementary crossover; signals may differ in length."""
    n = max(low_signal.shape[-1], high_signal.shape[-1])
    low = jnp.zeros(n).at[:low_signal.shape[-1]].set(low_signal)
    high = jnp.zeros(n).at[:high_signal.shape[-1]].set(high_signal)
    lo = apply_zero_phase_magnitude(
        low, lambda f: compute_lopass_magnitude(f, cutoff_norm, width))
    hi = apply_zero_phase_magnitude(
        high, lambda f: compute_hipass_magnitude(f, cutoff_norm, width))
    return lo + hi


def window_direct_arrival(signal, source_position, receiver_position,
                          sample_rate: float, speed_of_sound: float):
    """Half-Hann fade-in to the direct arrival (removes DC-ish pre-ring)."""
    distance = jnp.linalg.norm(
        jnp.asarray(receiver_position) - jnp.asarray(source_position))
    n = int(jnp.floor(distance * sample_rate / speed_of_sound))
    n = min(n, signal.shape[-1])
    if n == 0:
        return signal
    window = left_hanning(n)
    return signal.at[..., :n].multiply(window)
