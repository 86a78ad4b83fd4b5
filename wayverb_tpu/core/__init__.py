from wayverb_tpu.core.environment import Environment, ambient_density
from wayverb_tpu.core import surfaces, geometry, pressure, reverb

__all__ = [
    "Environment",
    "ambient_density",
    "surfaces",
    "geometry",
    "pressure",
    "reverb",
]
