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
# Tile sizes swept on v5e (r5, 2^16 rays, 5.4k/97k-tri halls):
# (RB, TB) = (512, 1024) maximizes BOTH the all-pairs rate (3.5e6
# rays/s small) and the Morton-culled rate (1.2e6 at 97k tris) — grid
# overhead per (ray, tri) tile visit dominates the culled path, so
# fewer/larger triangle tiles beat finer AABB granularity; RB=1024 or
# TB=2048 regress 5-10%.
RB = 512              # rays per tile
TB = 1024             # triangles per tile
BIG = 3.4e38


CULL_MIN_TRIS = 8192   # below this the all-pairs kernel wins outright


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PallasTriangles:
    """Packed triangle data for the MT kernel: (9, Tpad) f32 rows =
    (v0 | e1 | e2) components, T on lanes; padded rows are degenerate
    (all-zero ⇒ det 0 ⇒ miss).

    For scenes above CULL_MIN_TRIS the builder Morton-sorts triangles by
    centroid so each TB-tile is a compact spatial blob, and ships per-tile
    AABBs plus the sort permutation — the kernel then slab-tests each
    ray tile against the tile box and skips the 60-op MT math for tiles
    no ray can touch (the TPU-shaped replacement for the reference's
    per-ray voxel walk, ``src/core/src/cl/voxel.cpp:197-258``, whose
    serial gathers vectorize poorly)."""

    packed: Any          # (9, Tpad) f32
    num: int             # true triangle count (static)
    tile_boxes: Any = None   # (nT, 8) f32 [lo xyz, hi xyz, 0, 0]
    perm: Any = None         # (Tpad,) int32 sorted → original id
    inv_perm: Any = None     # (T,) int32 original → sorted id
    scene_lo: Any = None     # (3,) f32 — ray sort-key frame
    scene_inv_ext: Any = None   # (3,) f32

    @property
    def culled(self) -> bool:
        return self.tile_boxes is not None

    def tree_flatten(self):
        return (self.packed, self.tile_boxes, self.perm, self.inv_perm,
                self.scene_lo, self.scene_inv_ext), self.num

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux, *children[1:])


def _morton3(q):
    """Interleave 10-bit xyz → 30-bit Morton codes ((N, 3) uint32 in)."""
    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x
    return (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
            | (spread(q[:, 2]) << 2))


def build_pallas_triangles(soup: TriangleSoup,
                           cull: bool = None) -> PallasTriangles:
    c = np.asarray(soup.corners(), dtype=np.float32)        # (T, 3, 3)
    T = c.shape[0]
    if cull is None:
        cull = T > CULL_MIN_TRIS

    perm = inv_perm = tile_boxes = scene_lo = scene_inv_ext = None
    if cull:
        lo = c.reshape(-1, 3).min(axis=0)
        hi = c.reshape(-1, 3).max(axis=0)
        ext = np.maximum(hi - lo, 1e-9)
        cent = c.mean(axis=1)
        q = np.clip(((cent - lo) / ext) * 1023.0, 0, 1023).astype(
            np.uint32)
        order = np.argsort(_morton3(q), kind="stable")
        c = c[order]
        scene_lo = jnp.asarray(lo)
        scene_inv_ext = jnp.asarray((1.0 / ext).astype(np.float32))

    v0 = c[:, 0]
    e1 = c[:, 1] - v0
    e2 = c[:, 2] - v0
    packed = np.concatenate([v0.T, e1.T, e2.T], axis=0)     # (9, T)
    Tpad = -(-T // TB) * TB
    packed = np.pad(packed, ((0, 0), (0, Tpad - T)))

    if cull:
        perm_np = np.full(Tpad, -1, np.int32)
        perm_np[:T] = order.astype(np.int32)
        inv = np.empty(T, np.int32)
        inv[order] = np.arange(T, dtype=np.int32)
        nT = Tpad // TB
        boxes = np.zeros((nT, 8), np.float32)
        cpad = np.pad(c, ((0, Tpad - T), (0, 0), (0, 0)),
                      constant_values=np.nan)
        for ti in range(nT):
            blk = cpad[ti * TB:(ti + 1) * TB].reshape(-1, 3)
            blk = blk[~np.isnan(blk[:, 0])]
            if len(blk) == 0:
                boxes[ti, :3] = 1.0     # empty tile: inverted box misses
                boxes[ti, 3:6] = 0.0
            else:
                boxes[ti, :3] = blk.min(axis=0)
                boxes[ti, 3:6] = blk.max(axis=0)
        tile_boxes = jnp.asarray(boxes)
        perm = jnp.asarray(perm_np)
        inv_perm = jnp.asarray(inv)
    return PallasTriangles(packed=jnp.asarray(packed), num=T,
                           tile_boxes=tile_boxes, perm=perm,
                           inv_perm=inv_perm, scene_lo=scene_lo,
                           scene_inv_ext=scene_inv_ext)


def _mt_math(o_ref, d_ref, ex_ref, tri_ref, t_ref, i_ref, t_blk, numT):
    """The 60-op Moller-Trumbore tile body + running min-t update."""
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

    better = t_best < t_ref[...]
    t_ref[...] = jnp.where(better, t_best, t_ref[...])
    i_ref[...] = jnp.where(better, i_best, i_ref[...])


def _mt_kernel(o_ref, d_ref, ex_ref, tri_ref, t_ref, i_ref, *, nT, numT):
    t_blk = pl.program_id(1)

    @pl.when(t_blk == 0)
    def _():
        t_ref[...] = jnp.full(t_ref.shape, BIG, t_ref.dtype)
        i_ref[...] = jnp.zeros(i_ref.shape, i_ref.dtype)

    _mt_math(o_ref, d_ref, ex_ref, tri_ref, t_ref, i_ref, t_blk, numT)


def _mt_kernel_culled(o_ref, d_ref, ex_ref, tri_ref, box_ref, t_ref,
                      i_ref, *, nT, numT):
    """MT tile with a per-tile AABB gate: triangles are Morton-sorted so
    each TB-tile is a spatial blob; a ~25-op slab test per ray decides
    whether ANY ray in this (sorted, hence coherent) ray tile can hit the
    tile box closer than its current best — if not, the 60-op MT math for
    RB x TB pairs is skipped entirely."""
    t_blk = pl.program_id(1)

    @pl.when(t_blk == 0)
    def _():
        t_ref[...] = jnp.full(t_ref.shape, BIG, t_ref.dtype)
        i_ref[...] = jnp.zeros(i_ref.shape, i_ref.dtype)

    o = o_ref[...]                                             # (RB, 3)
    d = d_ref[...]
    safe = jnp.where(jnp.abs(d) < 1e-20,
                     jnp.where(d >= 0, 1e-20, -1e-20), d)
    rd = 1.0 / safe
    # per-component slab test with SMEM scalar box bounds (a (1, 8) VMEM
    # block would violate Mosaic's (8, 128) tiling rules)
    tnear = jnp.full_like(t_ref[...], -BIG)
    tfar = jnp.full_like(t_ref[...], BIG)
    for c in range(3):
        t0 = (box_ref[t_blk, c] - o[:, c:c + 1]) * rd[:, c:c + 1]
        t1 = (box_ref[t_blk, 3 + c] - o[:, c:c + 1]) * rd[:, c:c + 1]
        tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
        tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
    possible = (tnear <= tfar) & (tfar > 0.0) & (tnear < t_ref[...])

    @pl.when(jnp.any(possible))
    def _():
        _mt_math(o_ref, d_ref, ex_ref, tri_ref, t_ref, i_ref, t_blk,
                 numT)


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

    rblk = lambda w: pl.BlockSpec((RB, w), lambda r, t: (r, 0),  # noqa
                                  memory_space=pltpu.VMEM)
    in_specs = [rblk(3), rblk(3), rblk(1),
                pl.BlockSpec((9, TB), lambda r, t: (0, t),
                             memory_space=pltpu.VMEM)]
    args = [origin, direction, exclude[:, None].astype(jnp.int32),
            tris.packed]
    kernel = _mt_kernel
    if tris.culled:
        kernel = _mt_kernel_culled
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(tris.tile_boxes)

    out = pl.pallas_call(
        functools.partial(kernel, nT=nT, numT=tris.num),
        grid=(nR, nT),
        in_specs=in_specs,
        out_specs=(rblk(1), rblk(1)),
        out_shape=(jax.ShapeDtypeStruct((Rpad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Rpad, 1), jnp.int32)),
        interpret=interpret,
    )(*args)
    t, idx = out[0][:R, 0], out[1][:R, 0]
    return t, idx


def _ray_sort_keys(origin, direction, tris: PallasTriangles):
    """Spatial+directional sort key: 3-bit direction octant above a
    15-bit (5/axis) origin Morton code — rays in one RB tile then share
    an origin blob and an octant, which is what makes the per-tile AABB
    gate in _mt_kernel_culled actually skip."""
    q = jnp.clip((origin - tris.scene_lo[None, :])
                 * tris.scene_inv_ext[None, :] * 31.0, 0.0,
                 31.0).astype(jnp.int32)

    def spread5(x):
        x = (x | (x << 8)) & 0x0100F
        x = (x | (x << 4)) & 0x010C3
        x = (x | (x << 2)) & 0x09249
        return x

    morton = spread5(q[:, 0]) | (spread5(q[:, 1]) << 1) \
        | (spread5(q[:, 2]) << 2)
    octant = ((direction[:, 0] >= 0).astype(jnp.int32)
              | ((direction[:, 1] >= 0).astype(jnp.int32) << 1)
              | ((direction[:, 2] >= 0).astype(jnp.int32) << 2))
    return (octant << 15) | morton


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


@functools.lru_cache(maxsize=1)
def _argsort_ok() -> bool:
    """One-time capability probe: older axon PJRT stacks hit a jax
    lowering KeyError on argsort inside jit (closed_call cache miss);
    newer ones are fine.  Probe once instead of hard-gating by backend
    so ray sorting (the large-scene cull enabler) turns on wherever the
    stack supports it."""
    try:
        v = jax.jit(lambda x: jnp.argsort(x))(jnp.arange(8)[::-1])
        jax.block_until_ready(v)
        return True
    except Exception:
        return False


def mt_intersection(origin, direction, tris: PallasTriangles,
                    exclude_triangle=None, interpret=False):
    """Closest hit; same contract as ``geometry.scene_intersection``."""
    R = origin.shape[0]
    if exclude_triangle is None:
        exclude_triangle = jnp.full((R,), -1, dtype=jnp.int32)
    sort_rays = tris.culled and _argsort_ok()
    if tris.culled:
        # exclude/result ids are ORIGINAL triangle ids; the kernel works
        # in Morton-sorted ids
        exclude_triangle = jnp.where(
            exclude_triangle >= 0,
            tris.inv_perm[jnp.clip(exclude_triangle, 0, tris.num - 1)],
            -1)
    if sort_rays:
        order = jnp.argsort(_ray_sort_keys(origin, direction, tris))
        origin = origin[order]
        direction = direction[order]
        exclude_triangle = exclude_triangle[order]
    if use_pallas() or interpret:
        t, idx = _pallas_closest(origin, direction, exclude_triangle, tris,
                                 interpret=interpret)
    else:
        t, idx = _jnp_closest(origin, direction, exclude_triangle, tris)
    if sort_rays:
        t = jnp.zeros_like(t).at[order].set(t)
        idx = jnp.zeros_like(idx).at[order].set(idx)
    if tris.culled:
        idx = tris.perm[jnp.clip(idx, 0, tris.perm.shape[0] - 1)]
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
