"""Time-domain filters and decay analysis.

IIR filtering runs as a ``lax.scan`` over time with a direct-form-II
transposed state — the same recurrence the reference's in-kernel filters use
(``waveguide/cl/filters.cpp``: ``filter_step_canonical``), so coefficients
designed for one run unchanged in the other.

Parity: reference ``core/filters_common.h`` (biquad), ``core/dc_blocker.h``,
``core/schroeder.h`` (backwards-integrated decay), ``core/linear_regression.h``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def iir_filter(b, a, x, state=None):
    """Direct-form-II-transposed IIR along the last axis of ``x``.

    ``b``/``a``: (order+1,) with ``a[0]`` the normalizer.  Differentiable in
    both the signal and the coefficients.  Returns (y, final_state).
    """
    b = jnp.asarray(b, dtype=x.dtype)
    a = jnp.asarray(a, dtype=x.dtype)
    order = b.shape[0] - 1
    if state is None:
        state = jnp.zeros(x.shape[:-1] + (order,), dtype=x.dtype)

    def step(m, xn):
        y = (xn * b[0] + m[..., 0]) / a[0]
        shifted = jnp.concatenate(
            [m[..., 1:], jnp.zeros_like(m[..., :1])], axis=-1)
        m_new = shifted + b[1:] * xn[..., None] - a[1:] * y[..., None]
        return m_new, y

    state, y = jax.lax.scan(step, state, jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(y, 0, -1), state


def filter_step(x, state, b, a):
    """One DF2T step (matches the waveguide kernel's ``filter_step_canonical``).

    Returns (y, new_state); everything broadcasts over leading axes with the
    state's trailing axis = order.
    """
    y = (x * b[..., 0] + state[..., 0]) / a[..., 0]
    shifted = jnp.concatenate(
        [state[..., 1:], jnp.zeros_like(state[..., :1])], axis=-1)
    new_state = shifted + b[..., 1:] * x[..., None] - a[..., 1:] * y[..., None]
    return y, new_state


def biquad_cascade(sections_b, sections_a, x):
    """Cascade of biquads (S, 3) applied serially (reference biquad chain)."""
    y = x
    for i in range(sections_b.shape[0]):
        y, _ = iir_filter(sections_b[i], sections_a[i], y)
    return y


def dc_blocker_coefficients(r=0.995):
    """y[n] = x[n] - x[n-1] + R y[n-1]  (reference dc_blocker.h)."""
    return jnp.asarray([1.0, -1.0, 0.0]), jnp.asarray([1.0, -r, 0.0])


def linear_regression(x, y):
    """Least-squares line fit; returns (slope, intercept) over last axis."""
    mx = jnp.mean(x, axis=-1, keepdims=True)
    my = jnp.mean(y, axis=-1, keepdims=True)
    num = jnp.sum((x - mx) * (y - my), axis=-1)
    den = jnp.sum(jnp.square(x - mx), axis=-1)
    slope = num / den
    intercept = my[..., 0] - slope * mx[..., 0]
    return slope, intercept


def schroeder_integral(signal):
    """Backwards-integrated squared decay curve (not dB)."""
    sq = jnp.square(signal)
    return jnp.flip(jnp.cumsum(jnp.flip(sq, axis=-1), axis=-1), axis=-1)


def decay_time(signal, sample_rate, begin_db=-5.0, end_db=-25.0,
               full_range_db=60.0):
    """Reverb time by Schroeder integration + line fit between two levels.

    ``begin_db``/``end_db`` of (-5, -25) gives T20-extrapolated-to-60,
    (-5, -35) gives T30.  Differentiable (soft in the regression, hard in the
    window selection via stop_gradient on the mask).
    """
    curve = schroeder_integral(signal)
    db = 10.0 * jnp.log10(jnp.maximum(curve / curve[..., :1], 1e-30))
    mask = (db <= begin_db) & (db >= end_db)
    t = jnp.arange(signal.shape[-1], dtype=signal.dtype) / sample_rate
    w = jax.lax.stop_gradient(mask.astype(signal.dtype))
    n = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    mx = jnp.sum(w * t, axis=-1) / n
    my = jnp.sum(w * db, axis=-1) / n
    num = jnp.sum(w * (t - mx[..., None]) * (db - my[..., None]), axis=-1)
    den = jnp.sum(w * jnp.square(t - mx[..., None]), axis=-1)
    slope = num / jnp.maximum(den, 1e-30)  # dB per second (negative)
    return -full_range_db / slope


def rt60_measures(signal, sample_rate):
    """Common measures dict: EDT, T20, T30 from one IR."""
    return {
        "edt": decay_time(signal, sample_rate, 0.0, -10.0, 60.0),
        "t20": decay_time(signal, sample_rate, -5.0, -25.0, 60.0),
        "t30": decay_time(signal, sample_rate, -5.0, -35.0, 60.0),
    }
