"""Image-source impulses → broadband early IR.

Pipeline (parity: reference ``raytracer/image_source/postprocess.h:22-42``,
``raytracer/attenuator.h``): attenuate per impulse by the capsule model →
windowed-sinc deposit into an 8-band time histogram → multiband filter +
mixdown to one pressure signal.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp

from wayverb_tpu.core.attenuator import Hrtf, Microphone, Null
from wayverb_tpu.core.impulse import Impulses
from wayverb_tpu.raytracer.histogram import sinc_histogram
from wayverb_tpu.signal.multiband import multiband_filter_and_mixdown


def attenuate(method, receiver_position, impulses: Impulses):
    """Apply a capsule model; returns (volumes (N, bands), distances (N,)).

    For HRTF the listening position shifts to the ear, changing both gain
    direction and distance (interaural time difference), as in the reference.
    """
    receiver_position = jnp.asarray(receiver_position, dtype=jnp.float32)
    if isinstance(method, Null):
        return impulses.volume, impulses.distance
    if isinstance(method, Microphone):
        direction = impulses.position - receiver_position
        att = method.attenuation(direction)
        return impulses.volume * att[:, None], impulses.distance
    if isinstance(method, Hrtf):
        ear = method.ear_position(receiver_position)
        direction = impulses.position - ear
        att = method.attenuation(direction)         # (N, bands)
        distance = jnp.linalg.norm(direction, axis=-1)
        return impulses.volume * att, distance
    raise TypeError(f"unknown capsule method {type(method)}")


def postprocess(impulses: Impulses, method, receiver_position,
                speed_of_sound, sample_rate, num_bins: int | None = None):
    """Early-reflection pressure IR of length ``num_bins`` samples."""
    volumes, distances = attenuate(method, receiver_position, impulses)
    times = distances / speed_of_sound
    if num_bins is None:
        num_bins = int(math.floor(
            float(jnp.max(times)) * sample_rate)) + 1
    hist = sinc_histogram(times, volumes, sample_rate, num_bins)  # (T, bands)
    return multiband_filter_and_mixdown(hist.T, sample_rate)      # (T,)
