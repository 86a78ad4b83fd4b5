"""Excitation signal kernels for the waveguide source.

Parity: reference ``core/kernel.h:11-60`` + ``core/src/kernel.cpp``
(gaussian / sin-modulated gaussian / gaussian-dash with σ = 1/(2π f_c) and
delay ⌈8σ⌉; ricker with delay ⌈1/f_c⌉).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def gaussian(t, sigma):
    return jnp.exp(-(t * t) / (2.0 * sigma * sigma))


def sin_modulated_gaussian(t, sigma):
    return -gaussian(t, sigma) * jnp.sin(t / sigma)


def gaussian_dash(t, sigma):
    return -t * gaussian(t, sigma) / (sigma * sigma)


def ricker(t, f):
    u = jnp.square(jnp.pi * f * t)
    return (1.0 - 2.0 * u) * jnp.exp(-u)


def _gauss_like(fc: float, func):
    sigma = 1.0 / (2.0 * math.pi * fc)
    delay = int(math.ceil(8.0 * sigma))
    t = jnp.arange(2 * delay + 1, dtype=jnp.float32) - delay
    return func(t, sigma)


def gen_gaussian(fc: float):
    """Gaussian pulse sampled at unit rate; ``fc`` is normalized frequency."""
    return _gauss_like(fc, gaussian)


def gen_sin_modulated_gaussian(fc: float):
    return _gauss_like(fc, sin_modulated_gaussian)


def gen_gaussian_dash(fc: float):
    return _gauss_like(fc, gaussian_dash)


def gen_ricker(fc: float):
    delay = int(math.ceil(1.0 / fc))
    t = jnp.arange(2 * delay + 1, dtype=jnp.float32) - delay
    return ricker(t, fc)
