"""Arbitrary-geometry image sources: dedupe traced specular paths, validate
them geometrically, and compute per-path 8-band pressure.

The reference builds a trie of triangle-index paths from all rays
(``image_source/tree.cpp:185-193``), then walks it depth-first with
incremental mirroring and per-path backtracked ray casts
(``tree.cpp:100-173``).  Here the candidate set comes straight from the
tracer's (depth, R) triangle history; dedupe is a host-side ``np.unique``
per order, and validation/mirroring/pressure are batched over all paths of
one order (the irregular recursion becomes k small dense steps).

Pressure parity: ``fast_pressure_calculator.h:31-62`` — product over
bounces of angle-dependent reflectance (kuttruff eq 9.22) times the
specular (non-scattered) fraction.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np
import jax.numpy as jnp

from wayverb_tpu.core.geometry import (TriangleSoup, mirror_point,
                                       scene_intersection)
from wayverb_tpu.core.impulse import Impulses
from wayverb_tpu.core.surfaces import (Surface,
                                       absorption_to_pressure_reflectance,
                                       pressure_reflectance_at_angle,
                                       specular_pressure)


def collect_paths(triangle_history, max_order: int) -> Dict[int, np.ndarray]:
    """Unique specular path prefixes per order.

    ``triangle_history``: (depth, R) int32, -1 marks a dead ray.  Returns
    {order k: (P_k, k) int32}.  Order 1 paths are single wall bounces, etc.
    """
    hist = np.asarray(triangle_history)
    depth, num_rays = hist.shape
    out: Dict[int, np.ndarray] = {}
    for k in range(1, min(max_order, depth) + 1):
        prefix = hist[:k].T                                # (R, k)
        ok = np.all(prefix >= 0, axis=1)
        if not np.any(ok):
            continue
        unique = np.unique(prefix[ok], axis=0)
        out[k] = unique.astype(np.int32)
    return out


@dataclasses.dataclass
class ValidatedPaths:
    image_position: np.ndarray   # (P, 3) final image-source position
    cos_angles: np.ndarray       # (P, k)
    surfaces: np.ndarray         # (P, k) surface indices
    valid: np.ndarray            # (P,) bool


def validate_paths(paths: np.ndarray, soup: TriangleSoup, source,
                   receiver) -> ValidatedPaths:
    """Check each candidate path geometrically (batched over paths).

    Mirrors the source successively through the path's triangle planes,
    then casts back from the receiver through each expected triangle
    (tree.cpp:100-173): every segment must hit exactly the expected
    triangle, and the final segment must reach the source unobstructed.
    """
    paths = jnp.asarray(paths)
    P, k = paths.shape
    corners = soup.corners()                               # (T, 3, 3)
    source = jnp.asarray(source, dtype=jnp.float32)
    receiver = jnp.asarray(receiver, dtype=jnp.float32)

    # forward mirroring: images[j] = source mirrored through tris 0..j
    images = []
    img = jnp.tile(source[None, :], (P, 1))
    for j in range(k):
        img = mirror_point(img, corners[paths[:, j]])
        images.append(img)

    # backward validation from the receiver
    valid = jnp.ones((P,), dtype=bool)
    prev_pt = jnp.tile(receiver[None, :], (P, 1))
    prev_tri = jnp.full((P,), -1, dtype=jnp.int32)
    cos_angles = []
    surfaces = []
    for j in range(k - 1, -1, -1):
        target = images[j]                                 # (P, 3)
        direction = target - prev_pt
        norm = jnp.linalg.norm(direction, axis=-1, keepdims=True)
        direction = direction / jnp.maximum(norm, 1e-12)
        t, tri, hit = scene_intersection(prev_pt, direction, soup,
                                         exclude_triangle=prev_tri)
        valid = valid & hit & (tri == paths[:, j])
        hit_pt = prev_pt + direction * t[:, None]

        tri_c = corners[paths[:, j]]
        n = jnp.cross(tri_c[:, 1] - tri_c[:, 0], tri_c[:, 2] - tri_c[:, 0])
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                            1e-20)
        cos_angles.append(jnp.clip(
            jnp.abs(jnp.sum(direction * n, axis=-1)), 0.0, 1.0))
        surfaces.append(soup.surfaces[paths[:, j]])
        prev_pt = hit_pt
        prev_tri = paths[:, j]

    # line of sight from the source to the first intersection point
    direction = prev_pt - source[None, :]
    dist = jnp.linalg.norm(direction, axis=-1)
    direction = direction / jnp.maximum(dist[:, None], 1e-12)
    t, tri, hit = scene_intersection(
        jnp.tile(source[None, :], (P, 1)), direction, soup)
    valid = valid & hit & (tri == paths[:, 0])

    # reverse per-bounce arrays back to path order
    cos_angles = jnp.stack(cos_angles[::-1], axis=1)       # (P, k)
    surfaces = jnp.stack(surfaces[::-1], axis=1)
    return ValidatedPaths(
        image_position=np.asarray(images[-1]),
        cos_angles=np.asarray(cos_angles),
        surfaces=np.asarray(surfaces),
        valid=np.asarray(valid),
    )


def compute_path_pressure(validated: ValidatedPaths, surfaces: Surface,
                          receiver, flip_phase: bool = False) -> Impulses:
    """Per-path 8-band pressure impulses (invalid paths carry zero volume)."""
    receiver = jnp.asarray(receiver, dtype=jnp.float32)
    surf_idx = jnp.asarray(validated.surfaces)             # (P, k)
    cos = jnp.asarray(validated.cos_angles)[..., None]     # (P, k, 1)
    r0 = absorption_to_pressure_reflectance(
        surfaces.absorption[surf_idx])                     # (P, k, bands)
    refl = pressure_reflectance_at_angle(r0, cos)
    outgoing = specular_pressure(refl, surfaces.scattering[surf_idx])
    if flip_phase:
        outgoing = -outgoing
    volume = jnp.prod(outgoing, axis=1)                    # (P, bands)
    volume = volume * jnp.asarray(validated.valid)[:, None]
    position = jnp.asarray(validated.image_position)
    distance = jnp.linalg.norm(position - receiver, axis=-1)
    return Impulses(volume=volume, position=position, distance=distance)


def find_image_source_impulses(triangle_history, soup: TriangleSoup,
                               surfaces: Surface, source, receiver,
                               max_order: int,
                               flip_phase: bool = False) -> Impulses:
    """Full pipeline: history → dedupe → validate → pressures (+ nothing for
    the direct path — callers add ``exact.get_direct`` separately)."""
    groups = collect_paths(triangle_history, max_order)
    results: List[Impulses] = []
    for k, paths in sorted(groups.items()):
        validated = validate_paths(paths, soup, source, receiver)
        if not np.any(validated.valid):
            continue
        keep = np.nonzero(validated.valid)[0]
        validated = ValidatedPaths(
            image_position=validated.image_position[keep],
            cos_angles=validated.cos_angles[keep],
            surfaces=validated.surfaces[keep],
            valid=validated.valid[keep])
        results.append(
            compute_path_pressure(validated, surfaces, receiver, flip_phase))
    if not results:
        bands = surfaces.absorption.shape[-1]
        return Impulses(volume=jnp.zeros((0, bands)),
                        position=jnp.zeros((0, 3)),
                        distance=jnp.zeros((0,)))
    total = results[0]
    for r in results[1:]:
        total = total.concatenate(r)
    return total
