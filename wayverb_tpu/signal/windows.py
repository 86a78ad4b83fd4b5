"""Window functions and sinc kernels.

Parity: reference ``core/sinc.h`` (unwindowed sinc kernel, blackman,
hanning/left-hanning, windowed_sinc_kernel with blackman).
"""

from __future__ import annotations

import jax.numpy as jnp


def sinc(t):
    """sin(πt)/(πt) with sinc(0)=1."""
    return jnp.sinc(t)


def sinc_kernel(cutoff, length: int):
    """Lowpass sinc kernel (length odd, normalized cutoff 0..0.5)."""
    if length % 2 == 0:
        raise ValueError("sinc kernel length must be odd")
    i = jnp.arange(length, dtype=jnp.float32)
    return sinc(2.0 * cutoff * (i - (length - 1) / 2.0))


def blackman(length: int):
    a0, a1, a2 = 7938.0 / 18608.0, 9240.0 / 18608.0, 1430.0 / 18608.0
    offset = jnp.arange(length, dtype=jnp.float32) / (length - 1.0)
    return (a0 - a1 * jnp.cos(2.0 * jnp.pi * offset)
            + a2 * jnp.cos(4.0 * jnp.pi * offset))


def hanning(length: int):
    offset = jnp.arange(length, dtype=jnp.float32) / (length - 1.0)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * offset)


def left_hanning(length: int):
    """Rising half of a hann window (reference ``core::left_hanning``)."""
    offset = jnp.arange(length, dtype=jnp.float32) / (length - 1.0)
    return 0.5 - 0.5 * jnp.cos(jnp.pi * offset)


def right_hanning(length: int):
    offset = jnp.arange(length, dtype=jnp.float32) / (length - 1.0)
    return 0.5 + 0.5 * jnp.cos(jnp.pi * offset)


def windowed_sinc_kernel(cutoff, length: int):
    return sinc_kernel(cutoff, length) * blackman(length)
