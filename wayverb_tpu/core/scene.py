"""Scene loading: Wavefront OBJ → TriangleSoup + material table.

The reference uses assimp for many formats (``core/scene_data_loader.h``);
here we ship a dependency-free OBJ/MTL parser (the format used by the
reference's own test models) plus programmatic constructors.  Polygonal faces
are fan-triangulated.  Materials map to surface indices in declaration order.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from wayverb_tpu.core.geometry import TriangleSoup
from wayverb_tpu.core.surfaces import Surface, SIMULATION_BANDS


@dataclasses.dataclass
class SceneData:
    """Geometry + named material slots (the editable scene model)."""

    soup: TriangleSoup
    material_names: List[str]

    def with_surfaces(self, surfaces: Dict[str, Surface] | Surface) -> Surface:
        """Build the (num_materials, bands) surface table.

        Accepts either one Surface applied to every material or a dict from
        material name to Surface.
        """
        if isinstance(surfaces, Surface):
            absorption = jnp.tile(surfaces.absorption[None, :],
                                  (len(self.material_names), 1))
            scattering = jnp.tile(surfaces.scattering[None, :],
                                  (len(self.material_names), 1))
            return Surface(absorption, scattering)
        missing = [n for n in self.material_names if n not in surfaces]
        if missing:
            raise KeyError(f"no surface given for materials {missing}")
        absorption = jnp.stack(
            [surfaces[n].absorption for n in self.material_names])
        scattering = jnp.stack(
            [surfaces[n].scattering for n in self.material_names])
        return Surface(absorption, scattering)


def load_obj(path: str) -> SceneData:
    """Parse an OBJ file into a SceneData (vertices, triangles, materials)."""
    vertices: List[Tuple[float, float, float]] = []
    triangles: List[Tuple[int, int, int]] = []
    tri_materials: List[int] = []
    material_names: List[str] = []
    mat_index: Dict[str, int] = {}
    current_material = _get_material(mat_index, material_names, "default")

    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "v":
                vertices.append(tuple(float(x) for x in parts[1:4]))
            elif tag == "usemtl":
                name = parts[1] if len(parts) > 1 else "default"
                current_material = _get_material(
                    mat_index, material_names, name)
            elif tag == "f":
                idx = [_vertex_index(p, len(vertices)) for p in parts[1:]]
                for i in range(1, len(idx) - 1):
                    triangles.append((idx[0], idx[i], idx[i + 1]))
                    tri_materials.append(current_material)

    tri_arr = np.asarray(triangles, dtype=np.int32)
    if tri_arr.size and (tri_arr.min() < 0 or tri_arr.max() >= len(vertices)):
        raise ValueError(
            f"{path}: face references vertex index out of range "
            f"(have {len(vertices)} vertices)")
    soup = TriangleSoup(
        vertices=jnp.asarray(np.asarray(vertices, dtype=np.float32)),
        triangles=jnp.asarray(tri_arr),
        surfaces=jnp.asarray(np.asarray(tri_materials, dtype=np.int32)),
    )
    return SceneData(soup=soup, material_names=material_names)


def save_obj(path: str, scene: SceneData) -> None:
    """Write geometry back out as OBJ (re-export parity with the reference)."""
    soup = scene.soup
    verts = np.asarray(soup.vertices)
    tris = np.asarray(soup.triangles)
    mats = np.asarray(soup.surfaces)
    with open(path, "w") as f:
        f.write("# exported by wayverb_tpu\n")
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        last_mat = -1
        for t, m in zip(tris, mats):
            if m != last_mat:
                f.write(f"usemtl {scene.material_names[m]}\n")
                last_mat = m
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")


def _get_material(index: Dict[str, int], names: List[str], name: str) -> int:
    if name not in index:
        index[name] = len(names)
        names.append(name)
    return index[name]


def _vertex_index(token: str, num_vertices: int) -> int:
    i = int(token.split("/")[0])
    return i - 1 if i > 0 else num_vertices + i
