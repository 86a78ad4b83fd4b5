"""Surface acoustics: absorption / reflectance / impedance conversions.

All functions are elementwise over 8-band arrays (``bands`` axis last) and
differentiable.

Parity: reference ``core/surfaces.h:24-65`` (conversion chain) and
``core/cl/scene_structs.h:10-49`` (8-band surface, ``simulation_bands = 8``).
Energy bookkeeping per vorlander2007 p.45: reflected = 1-a, scattered =
s(1-a), specular = (1-s)(1-a).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

SIMULATION_BANDS = 8


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Surface:
    """Per-band absorption + scattering for one material.

    Both fields have shape ``(..., bands)``; a scene-wide table is simply a
    ``Surface`` whose leading axis indexes materials.
    """

    absorption: Any
    scattering: Any

    def tree_flatten(self):
        return (self.absorption, self.scattering), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def uniform(cls, absorption: float, scattering: float,
                bands: int = SIMULATION_BANDS) -> "Surface":
        return cls(
            absorption=jnp.full((bands,), absorption, dtype=jnp.float32),
            scattering=jnp.full((bands,), scattering, dtype=jnp.float32),
        )


def absorption_to_energy_reflectance(a):
    return 1.0 - a


def absorption_to_pressure_reflectance(a):
    return jnp.sqrt(absorption_to_energy_reflectance(a))


def pressure_reflectance_to_average_wall_impedance(r):
    return (1.0 + r) / (1.0 - r)


def average_wall_impedance_to_pressure_reflectance(z, cos_angle):
    """Angle-dependent pressure reflectance from normalized wall impedance.

    ``cos_angle`` must be in [0, 1].
    """
    tmp = z * cos_angle
    return (tmp - 1.0) / (tmp + 1.0)


def pressure_reflectance_at_angle(normal_reflectance, cos_angle):
    """Angle-dependent reflectance directly from the normal-incidence value.

    Algebraically identical to converting through wall impedance
    (``average_wall_impedance_to_pressure_reflectance ∘
    pressure_reflectance_to_average_wall_impedance``) but stable at
    reflectance → 1 (zero absorption), where the impedance blows up.
    """
    num = cos_angle * (1.0 + normal_reflectance) - (1.0 - normal_reflectance)
    den = cos_angle * (1.0 + normal_reflectance) + (1.0 - normal_reflectance)
    return num / jnp.maximum(den, 1e-20)


def scattered_pressure(total_reflected, scattering):
    return total_reflected * scattering


def specular_pressure(total_reflected, scattering):
    return total_reflected * (1.0 - scattering)
