"""Pallas ray–triangle intersection: VMEM-tiled Möller–Trumbore.

The dense XLA broadcast (geometry.scene_intersection) materializes (R, T, 3)
intermediates in HBM — at 2¹⁶ rays × 5k triangles that is ~4 GB of traffic
per bounce and the tracer runs HBM-bound at ~350 k ray·bounces/s.  The
voxel DDA (accel.py) replaces traffic with gathers, which TPUs also hate.

This kernel is the TPU-shaped answer: tile (R_B, T_B) pairs through VMEM,
keep every intermediate as a (R_B, T_B) register/VMEM tile, reduce min-t
per ray across triangle tiles in-place, and write one (R,) result.  Work is
pure VPU compute (~60 ops/pair) with HBM traffic linear in R + T.

No VJP: intersection indices/params are piecewise-constant in geometry, and
the tracer's differentiable quantities (band energies) flow through the
material tables, not through hit coordinates.

Parity oracle: ``geometry.ray_triangle_intersection`` (identical constants:
EPSILON, barycentric slack 1e-4).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wayverb_tpu.core.geometry import EPSILON, TriangleSoup

SLACK = 1e-4          # barycentric edge slack (geometry.py:100)
RB = 512              # rays per tile
TB = 512              # triangles per tile
BIG = 3.4e38


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PallasTriangles:
    """Packed triangle data for the MT kernel: (9, Tpad) f32 rows =
    (v0 | e1 | e2) components, T on lanes; padded rows are degenerate
    (all-zero ⇒ det 0 ⇒ miss)."""

    packed: Any          # (9, Tpad) f32
    num: int             # true triangle count (static)

    def tree_flatten(self):
        return (self.packed,), self.num

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


def build_pallas_triangles(soup: TriangleSoup) -> PallasTriangles:
    c = np.asarray(soup.corners(), dtype=np.float32)        # (T, 3, 3)
    v0 = c[:, 0]
    e1 = c[:, 1] - v0
    e2 = c[:, 2] - v0
    packed = np.concatenate([v0.T, e1.T, e2.T], axis=0)     # (9, T)
    T = packed.shape[1]
    Tpad = -(-T // TB) * TB
    packed = np.pad(packed, ((0, 0), (0, Tpad - T)))
    return PallasTriangles(packed=jnp.asarray(packed), num=T)


def _mt_kernel(o_ref, d_ref, ex_ref, tri_ref, t_ref, i_ref, *, nT, numT):
    t_blk = pl.program_id(1)

    ox, oy, oz = o_ref[:, 0:1], o_ref[:, 1:2], o_ref[:, 2:3]   # (RB, 1)
    dx, dy, dz = d_ref[:, 0:1], d_ref[:, 1:2], d_ref[:, 2:3]
    v0x, v0y, v0z = tri_ref[0:1], tri_ref[1:2], tri_ref[2:3]   # (1, TB)
    e1x, e1y, e1z = tri_ref[3:4], tri_ref[4:5], tri_ref[5:6]
    e2x, e2y, e2z = tri_ref[6:7], tri_ref[7:8], tri_ref[8:9]

    # pvec = d × e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) > EPSILON
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    # tvec = o − v0
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec × e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

    ids = t_blk * TB + jax.lax.broadcasted_iota(
        jnp.int32, (1, tri_ref.shape[1]), 1)                   # (1, TB)
    hit = ok & (u >= -SLACK) & (v >= -SLACK) & (u + v <= 1.0 + SLACK) \
        & (t > EPSILON) & (ids < numT) & (ids != ex_ref[:, 0:1])
    t_masked = jnp.where(hit, t, BIG)

    k = jnp.argmin(t_masked, axis=1, keepdims=True)            # (RB, 1)
    t_best = jnp.min(t_masked, axis=1, keepdims=True)
    i_best = (t_blk * TB + k).astype(jnp.int32)

    @pl.when(t_blk == 0)
    def _():
        t_ref[...] = jnp.full(t_ref.shape, BIG, t_ref.dtype)
        i_ref[...] = jnp.zeros(i_ref.shape, i_ref.dtype)

    better = t_best < t_ref[...]
    t_ref[...] = jnp.where(better, t_best, t_ref[...])
    i_ref[...] = jnp.where(better, i_best, i_ref[...])


def _pallas_closest(origin, direction, exclude, tris: PallasTriangles,
                    interpret=False):
    R = origin.shape[0]
    Rpad = -(-R // RB) * RB
    if Rpad != R:
        origin = jnp.pad(origin, ((0, Rpad - R), (0, 0)))
        direction = jnp.pad(direction, ((0, Rpad - R), (0, 0)))
        exclude = jnp.pad(exclude, (0, Rpad - R))
    Tpad = tris.packed.shape[1]
    nR, nT = Rpad // RB, Tpad // TB

    out = pl.pallas_call(
        functools.partial(_mt_kernel, nT=nT, numT=tris.num),
        grid=(nR, nT),
        in_specs=[
            pl.BlockSpec((RB, 3), lambda r, t: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 3), lambda r, t: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1), lambda r, t: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, TB), lambda r, t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((RB, 1), lambda r, t: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1), lambda r, t: (r, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((Rpad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Rpad, 1), jnp.int32)),
        interpret=interpret,
    )(origin, direction, exclude[:, None].astype(jnp.int32), tris.packed)
    t, idx = out[0][:R, 0], out[1][:R, 0]
    return t, idx


def _jnp_closest(origin, direction, exclude, tris: PallasTriangles):
    """Oracle/CPU fallback with identical packed-data semantics."""
    p = tris.packed
    v0 = p[0:3].T[None]                       # (1, Tpad, 3)
    e1 = p[3:6].T[None]
    e2 = p[6:9].T[None]
    d = direction[:, None, :]
    o = origin[:, None, :]
    pv = jnp.cross(d, e2)
    det = jnp.sum(e1 * pv, axis=-1)
    ok = jnp.abs(det) > EPSILON
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tv = o - v0
    u = jnp.sum(tv * pv, axis=-1) * inv
    qv = jnp.cross(tv, e1)
    v = jnp.sum(d * qv, axis=-1) * inv
    t = jnp.sum(e2 * qv, axis=-1) * inv
    ids = jnp.arange(p.shape[1])[None, :]
    hit = ok & (u >= -SLACK) & (v >= -SLACK) & (u + v <= 1.0 + SLACK) \
        & (t > EPSILON) & (ids < tris.num) & (ids != exclude[:, None])
    tm = jnp.where(hit, t, BIG)
    idx = jnp.argmin(tm, axis=-1)
    return jnp.min(tm, axis=-1), idx.astype(jnp.int32)


def use_pallas() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def mt_intersection(origin, direction, tris: PallasTriangles,
                    exclude_triangle=None, interpret=False):
    """Closest hit; same contract as ``geometry.scene_intersection``."""
    R = origin.shape[0]
    if exclude_triangle is None:
        exclude_triangle = jnp.full((R,), -1, dtype=jnp.int32)
    if use_pallas() or interpret:
        t, idx = _pallas_closest(origin, direction, exclude_triangle, tris,
                                 interpret=interpret)
    else:
        t, idx = _jnp_closest(origin, direction, exclude_triangle, tris)
    hit = t < BIG
    return jnp.where(hit, t, jnp.inf), idx, hit


def mt_line_of_sight(start, end, tris: PallasTriangles,
                     exclude_triangle=None):
    seg = end - start
    dist = jnp.linalg.norm(seg, axis=-1)
    direction = seg / jnp.maximum(dist[:, None], 1e-20)
    t, _, any_hit = mt_intersection(start, direction, tris,
                                    exclude_triangle=exclude_triangle)
    return (~any_hit) | (t >= dist * (1.0 - 1e-4))
