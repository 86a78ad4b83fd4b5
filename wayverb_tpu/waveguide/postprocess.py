"""Waveguide output → audio-rate pressure signal.

Pipeline (parity: reference ``waveguide/postprocess.h:57-126`` and
``waveguide/attenuator.h``): per-step directional receiver output is
attenuated by the capsule (gain applied in intensity, converted back to
signed pressure), multiband HRTF output is mixed down, the mesh-rate signal
is resampled to the output rate, each band is bandpassed to its valid range
(width 0.1) and summed, and a 10 Hz DC blocker finishes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List

import jax.numpy as jnp

from wayverb_tpu.core.attenuator import Hrtf, Microphone, Null
from wayverb_tpu.signal.multiband import (apply_zero_phase_magnitude,
                                          compute_bandpass_magnitude,
                                          compute_hipass_magnitude,
                                          multiband_filter_and_mixdown)
from wayverb_tpu.signal.resample import resample


@dataclasses.dataclass(frozen=True)
class BandpassBand:
    """One waveguide band: receiver output + the Hz range it covers."""

    pressure: Any        # (T,)
    intensity: Any       # (T, 3)
    sample_rate: float
    valid_hz: tuple      # (lo, hi)


def attenuate(method, acoustic_impedance, intensity, pressure):
    """Capsule gain in the intensity domain → signed pressure trace.

    intensity: (T, 3) instantaneous intensity vectors; pressure: (T,).
    Returns (T,) for null/microphone, (T, bands) for HRTF.
    """
    if isinstance(method, Null):
        return pressure
    att = method.attenuation(-intensity)           # (T,) or (T, bands)
    magnitude = jnp.linalg.norm(intensity, axis=-1)
    if att.ndim == pressure.ndim:                   # scalar gain per step
        i = magnitude * att * att
        return jnp.copysign(jnp.sqrt(i * acoustic_impedance), pressure)
    i = magnitude[:, None] * att * att
    return jnp.copysign(jnp.sqrt(i * acoustic_impedance), pressure[:, None])


def postprocess_band(band: BandpassBand, method, acoustic_impedance,
                     output_sample_rate: float):
    """One band → attenuated, mixed down, resampled pressure at output rate."""
    signal = attenuate(method, acoustic_impedance, band.intensity,
                       band.pressure)
    if signal.ndim == 2:  # HRTF: (T, bands) → mixdown at the mesh rate
        signal = multiband_filter_and_mixdown(signal.T, band.sample_rate)
    return resample(signal, band.sample_rate, output_sample_rate)


def postprocess(bands: List[BandpassBand], method, acoustic_impedance,
                output_sample_rate: float):
    """Full multi-band postprocess with per-band bandpass + DC blocking."""
    total = None
    for band in bands:
        processed = postprocess_band(band, method, acoustic_impedance,
                                     output_sample_rate)
        lo, hi = band.valid_hz
        lo_n = lo / output_sample_rate
        hi_n = hi / output_sample_rate
        processed = apply_zero_phase_magnitude(
            processed,
            lambda f, lo_n=lo_n, hi_n=hi_n: compute_bandpass_magnitude(
                f, lo_n, hi_n, 0.1) if lo_n > 0
            else _lopass_only(f, hi_n))
        if total is None:
            total = processed
        elif processed.shape[-1] >= total.shape[-1]:
            total = processed.at[..., :total.shape[-1]].add(total)
        else:
            total = total.at[..., :processed.shape[-1]].add(processed)

    dc = 10.0 / output_sample_rate
    return apply_zero_phase_magnitude(
        total, lambda f: compute_hipass_magnitude(f, dc, 0.9))


def _lopass_only(f, hi_n):
    from wayverb_tpu.signal.multiband import compute_lopass_magnitude
    return compute_lopass_magnitude(f, hi_n, 0.1)
