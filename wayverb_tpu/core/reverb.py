"""Sabine / Eyring reverb-time prediction and room statistics.

Parity: reference ``core/reverb_time.h:148-197`` (sabine/eyring, 0.161
constant), ``:107`` (volume estimate), air absorption per fu2015 eq. 11.
"""

from __future__ import annotations

import jax.numpy as jnp

from wayverb_tpu.core.geometry import TriangleSoup, triangle_areas, \
    tetrahedron_volume_sum


def equivalent_absorption_area(soup: TriangleSoup, absorption):
    """Σ area_i · α_i with per-band absorption (T or S, bands).

    ``absorption``: (num_materials, bands); per-triangle material comes from
    ``soup.surfaces``.
    """
    areas = triangle_areas(soup)                      # (T,)
    tri_abs = absorption[soup.surfaces]               # (T, bands)
    return jnp.sum(areas[:, None] * tri_abs, axis=0)  # (bands,)


def total_area(soup: TriangleSoup):
    return jnp.sum(triangle_areas(soup))


def estimate_room_volume(soup: TriangleSoup):
    return tetrahedron_volume_sum(soup)


def sabine_reverb_time(room_volume, absorption_area, air_coefficient=0.0):
    """T60 = 0.161 V / (A + 4 V m)  (kuttruff 5.9)."""
    return 0.161 * room_volume / (
        absorption_area + 4.0 * room_volume * air_coefficient)


def eyring_reverb_time(room_volume, absorption_area, full_area,
                       air_coefficient=0.0):
    """T60 = 0.161 V / (-S ln(1 - A/S) + 4 V m)  (kuttruff 5.24)."""
    return 0.161 * room_volume / (
        -full_area * jnp.log(1.0 - absorption_area / full_area)
        + 4.0 * room_volume * air_coefficient)


def estimate_air_intensity_absorption(frequency, humidity):
    """Air intensity absorption coefficient (fu2015 eq. 11)."""
    return (0.0275 / humidity) * jnp.power(frequency / 1000.0, 1.7)
