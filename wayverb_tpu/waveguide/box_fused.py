"""Fused shoebox waveguide step: plane boundaries + one stencil kernel.

Round-1's boundary paths dominated the step time (gather path ~17 ms/step,
region path ~2 ms vs ~0.2 ms of interior stencil at 224³) because boundary
work went through gathers or 26 sequential full-field dynamic-update-slices.
This module restructures the whole update around two observations:

1. For a shoebox, every boundary node lies in one of SIX grid planes
   (x = ilo−1, x = ihi+1, y = …, z = …), and a node's inner direction set is
   exactly the set of planes it belongs to (faces → 1 plane, edges → 2,
   corners → 3).  Each plane's pressures, IIR ghost-point filter states and
   update equations are dense 2-D arrays — O(n²) work with **no gathers or
   scatters at all**.  Edge/corner coupling between planes is a handful of
   static row/column adds.  (Same equations as the reference
   ``src/waveguide/src/program.cpp:331-388``; oracle: ``waveguide.naive``.)

2. The interior update, the *placement* of the six boundary planes into
   the next field, and the *extraction* of the six inner planes (the next
   step's boundary inputs) fuse into ONE rolling-window Pallas kernel:
   grid step i receives ``cur`` block i (auto-pipelined — each block is
   fetched from HBM exactly once), keeps the previous block plus one tail
   plane in VMEM scratch, and computes slab i−1.  The inside mask comes
   from compile-time y/z bounds plus a per-row traced x test (the x offset
   stays traced so one compiled kernel serves shards of a larger mesh),
   splices are partial ref stores / lane selects, and no plane of the 3-D
   field is ever sliced on the XLA side (a strided plane slice costs
   ~50 µs on TPU; the carried-plane design needs none).

Per-step HBM traffic = |cur| + |prev| + |next| — exactly the 12 B/node
speed-of-light model used by bench.py.

The boundary-plane math stays in plain JAX (it is tiny and must be
differentiable w.r.t. the filter coefficients); the stencil+splice kernel is
linear with a hand-written VJP whose backward pass is a second Pallas kernel
of identical structure (the adjoint of a masked stencil is the stencil of
the masked cotangent).

Geometry (box bounds, shard offsets) enters the kernel through a scalar-
prefetch SMEM vector so one compiled kernel serves every mesh of the same
shape, including shards of a larger mesh (the shard's x-offset is a traced
value).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wayverb_tpu.waveguide.descriptor import COURANT, COURANT_SQ

# planes in port order: (axis, side) with side 0 = low wall, 1 = high wall.
# Plane index == face index in the (nx, px, ny, py, nz, pz) convention used
# by run.compute_mesh's face_surfaces.
PLANES: Tuple[Tuple[int, int], ...] = (
    (0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (2, 1))

XT = 8  # x-planes per kernel tile (sublane-aligned for in-kernel plane slices)


def _other_axes(axis: int) -> Tuple[int, int]:
    return tuple(a for a in range(3) if a != axis)


@dataclasses.dataclass(frozen=True)
class BoxSpec:
    """Static shoebox mesh geometry (node-coordinate box bounds).

    ``ilo``/``ihi``: first/last INSIDE node per axis.  Boundary planes sit at
    ``ilo−1`` and ``ihi+1``.  The construction in ``descriptor.
    compute_adjusted_boundary`` guarantees at least one all-outside plane at
    each grid extreme (ilo ≥ 2, ihi ≤ dim−3), which the kernel's clamped
    halo DMAs rely on (clamped reads land on all-zero planes).
    """

    dims: Tuple[int, int, int]
    ilo: Tuple[int, int, int]
    ihi: Tuple[int, int, int]
    face_surface: Tuple[int, int, int, int, int, int]

    def __post_init__(self):
        for a in range(3):
            if not (1 <= self.ilo[a] - 1 and
                    self.ihi[a] + 1 <= self.dims[a] - 2):
                raise ValueError(
                    f"axis {a}: boundary planes [{self.ilo[a]-1}, "
                    f"{self.ihi[a]+1}] must leave one outside plane at each "
                    f"grid end (dims {self.dims})")
            if self.ihi[a] - self.ilo[a] < 2:
                raise ValueError("box interior too thin for the plane path")

    def plane_shape(self, plane_idx: int) -> Tuple[int, int]:
        a1, a2 = _other_axes(PLANES[plane_idx][0])
        return (self.dims[a1], self.dims[a2])

    def initial_states(self, order: int, dtype=jnp.float32):
        return tuple(jnp.zeros(self.plane_shape(p) + (order,), dtype=dtype)
                     for p in range(6))

    def geom_array(self, x_offset=0, y_offset=0, z_offset=0) -> jnp.ndarray:
        """SMEM geometry vector for the kernel (offsets may be traced)."""
        return jnp.asarray(
            [x_offset, y_offset, z_offset,
             self.ilo[0], self.ihi[0], self.ilo[1], self.ihi[1],
             self.ilo[2], self.ihi[2]], dtype=jnp.int32)


def spec_from_inside(inside: np.ndarray, face_surfaces=None) -> BoxSpec:
    """Build a BoxSpec from a solid-box inside mask."""
    idx = np.argwhere(inside)
    lo = idx.min(axis=0)
    hi = idx.max(axis=0)
    if int(np.prod(hi - lo + 1)) != len(idx):
        raise ValueError("inside mask is not a solid box")
    if face_surfaces is None:
        face_surfaces = (0,) * 6
    return BoxSpec(dims=tuple(int(d) for d in inside.shape),
                   ilo=tuple(int(v) for v in lo),
                   ihi=tuple(int(v) for v in hi),
                   face_surface=tuple(int(s) for s in face_surfaces))


# ---------------------------------------------------------------------------
# boundary planes (pure JAX, differentiable)

def _take_plane(field, axis: int, coord: int):
    """2-D slice of a 3-D field at ``coord`` along ``axis``."""
    return jax.lax.index_in_dim(field, coord, axis, keepdims=False)


def _shift(arr2d, axis: int, delta: int):
    """arr[i] = arr_old[i + delta] with zero fill (delta ∈ {−1, +1})."""
    if delta == -1:
        pad = [(1, 0), (0, 0)] if axis == 0 else [(0, 0), (1, 0)]
        sl = (slice(0, -1), slice(None)) if axis == 0 \
            else (slice(None), slice(0, -1))
    else:
        pad = [(0, 1), (0, 0)] if axis == 0 else [(0, 0), (0, 1)]
        sl = (slice(1, None), slice(None)) if axis == 0 \
            else (slice(None), slice(1, None))
    return jnp.pad(arr2d[sl], pad)


def _plane_line(state0, q_axis: int, fixed_axis: int, coord: int):
    """Extract the line of plane q's m₀ at ``fixed_axis == coord``.

    ``state0``: (U, V) array of plane q (axes = _other_axes(q_axis)).
    """
    qa = _other_axes(q_axis)
    return state0[coord, :] if fixed_axis == qa[0] else state0[:, coord]


def plane_boundary_step(cur, prev, states: Sequence[Any], spec: BoxSpec,
                        face_b, face_a):
    """Boundary-plane updates, extracting plane slices from the 3-D fields.

    Test/oracle convenience wrapper around ``plane_boundary_step_planes``
    (the production scan carries the plane values instead — strided plane
    slices of the 3-D field cost ~50 µs each on TPU).
    """
    blo = tuple(spec.ilo[a] - 1 for a in range(3))
    bhi = tuple(spec.ihi[a] + 1 for a in range(3))
    cur_pl, cur_in, prev_pl = [], [], []
    for (a, side) in PLANES:
        pc = blo[a] if side == 0 else bhi[a]
        pci = pc + 1 if side == 0 else pc - 1
        cur_pl.append(_take_plane(cur, a, pc))
        cur_in.append(_take_plane(cur, a, pci))
        prev_pl.append(_take_plane(prev, a, pc))
    return plane_boundary_step_planes(tuple(cur_pl), tuple(cur_in),
                                      tuple(prev_pl), states, spec,
                                      face_b, face_a)


def stacked_plane_shape(spec: BoxSpec) -> Tuple[int, int]:
    """Uniform (Umax, Vmax) every plane pads to for the stacked update."""
    shapes = [spec.plane_shape(p) for p in range(6)]
    return (max(s[0] for s in shapes), max(s[1] for s in shapes))


def stack_planes(planes6, spec: BoxSpec, dtype=None):
    """6-tuple of (U_p, V_p[, ...]) planes → one (6, Umax, Vmax[, ...])."""
    Umax, Vmax = stacked_plane_shape(spec)

    def pad(x, p):
        U, V = spec.plane_shape(p)
        if dtype is not None:
            x = x.astype(dtype)
        widths = ((0, Umax - U), (0, Vmax - V)) + ((0, 0),) * (x.ndim - 2)
        return jnp.pad(x, widths)

    return jnp.stack([pad(planes6[p], p) for p in range(6)])


def unstack_planes(stack, spec: BoxSpec, dtype=None):
    """(6, Umax, Vmax[, ...]) → 6-tuple of true-shape planes."""
    out = []
    for p in range(6):
        U, V = spec.plane_shape(p)
        x = stack[p, :U, :V]
        out.append(x.astype(dtype) if dtype is not None else x)
    return tuple(out)


def _stacked_masks(spec: BoxSpec, Umax: int, Vmax: int):
    """Static per-plane masks for the stacked update (compile-time consts).

    act: active-region mask; w_um/up/vm/vp: neighbour weights encoding the
    2×-ghost closure at in-plane box edges (program.cpp:331-388)."""
    blo = tuple(spec.ilo[a] - 1 for a in range(3))
    bhi = tuple(spec.ihi[a] + 1 for a in range(3))
    act = np.zeros((6, Umax, Vmax), np.float32)
    w = {k: np.zeros((6, Umax, Vmax), np.float32)
         for k in ("um", "up", "vm", "vp")}
    u = np.arange(Umax)[:, None]
    v = np.arange(Vmax)[None, :]
    for pi, (a, side) in enumerate(PLANES):
        a1, a2 = _other_axes(a)
        act[pi] = ((u >= blo[a1]) & (u <= bhi[a1]) &
                   (v >= blo[a2]) & (v <= bhi[a2]))
        w["um"][pi] = np.where(u == blo[a1], 0, np.where(u == bhi[a1], 2, 1))
        w["up"][pi] = np.where(u == blo[a1], 2, np.where(u == bhi[a1], 0, 1))
        w["vm"][pi] = np.where(v == blo[a2], 0, np.where(v == bhi[a2], 2, 1))
        w["vp"][pi] = np.where(v == blo[a2], 2, np.where(v == bhi[a2], 0, 1))
    return act, w


def _shift_s(arr, axis: int, delta: int):
    """Stacked variant of _shift on (6, U, V): axis ∈ {1, 2}."""
    z = jnp.zeros_like(jax.lax.slice_in_dim(arr, 0, 1, axis=axis))
    if delta == -1:
        body = jax.lax.slice_in_dim(arr, 0, arr.shape[axis] - 1, axis=axis)
        return jnp.concatenate([z, body], axis=axis)
    body = jax.lax.slice_in_dim(arr, 1, arr.shape[axis], axis=axis)
    return jnp.concatenate([body, z], axis=axis)


def plane_boundary_step_stacked(pl_s, in_s, prev_s, st_s, spec: BoxSpec,
                                face_b, face_a):
    """All six boundary-plane updates on stacked (6, Umax, Vmax) arrays.

    One batched formulation of the per-plane math (reference
    ``program.cpp:331-388`` boundary update + ``filters.cpp`` canonical DF2T
    ghost-point advance): every elementwise op covers all six planes at
    once, the edge/corner cross-plane coupling is static one-hot masks times
    broadcast lines (no dynamic-update-slices — round 2's 24 `.at[]` ops per
    step were the dominant XLA residue), and the padded region provably
    stays zero (act = 0 there and the filter input is zero whenever
    m0 = prev = new_p = 0).

    ``face_b``/``face_a``: (6, order+1), traced (material gradients flow
    through).  Returns (pplus_s (6, Umax, Vmax), new_st_s (6, U, V, order)).
    """
    sdtype = st_s.dtype
    Umax, Vmax = pl_s.shape[1], pl_s.shape[2]
    blo = tuple(spec.ilo[a] - 1 for a in range(3))
    bhi = tuple(spec.ihi[a] + 1 for a in range(3))

    act_np, w_np = _stacked_masks(spec, Umax, Vmax)
    act = jnp.asarray(act_np, dtype=sdtype)
    w = {k: jnp.asarray(v, dtype=sdtype) for k, v in w_np.items()}

    pl_s = pl_s.astype(sdtype)
    in_s = in_s.astype(sdtype)
    prev_s = prev_s.astype(sdtype)

    csw = COURANT_SQ * (2.0 * in_s
                        + w["um"] * _shift_s(pl_s, 1, -1)
                        + w["up"] * _shift_s(pl_s, 1, +1)
                        + w["vm"] * _shift_s(pl_s, 2, -1)
                        + w["vp"] * _shift_s(pl_s, 2, +1))

    b0 = face_b[:, 0].astype(sdtype)           # (6,)
    a0 = face_a[:, 0].astype(sdtype)
    m0 = st_s[..., 0]                           # (6, Umax, Vmax)

    # per-plane fw/cw with edge/corner coupling as static masks × lines
    fw_planes, cw_planes = [], []
    u1 = np.arange(Umax)[:, None]
    v1 = np.arange(Vmax)[None, :]
    for pi, (a, side) in enumerate(PLANES):
        pc = blo[a] if side == 0 else bhi[a]
        a1, a2 = _other_axes(a)
        fw_p = m0[pi] / b0[pi]
        cw_p = jnp.broadcast_to((a0[pi] / b0[pi])[None, None],
                                (Umax, Vmax))
        for edge_axis, addr in ((a1, "row"), (a2, "col")):
            for s2 in (0, 1):
                q = PLANES.index((edge_axis, s2))
                qc = blo[edge_axis] if s2 == 0 else bhi[edge_axis]
                qa = _other_axes(edge_axis)
                raw = m0[q, pc, :] if a == qa[0] else m0[q, :, pc]
                if addr == "row":
                    mask = jnp.asarray((u1 == qc) & (v1 >= 0), dtype=sdtype)
                    tgt = Vmax
                    line = raw if raw.shape[0] == tgt else (
                        jnp.pad(raw[:tgt], (0, max(0, tgt - raw.shape[0]))))
                    line_b = line[None, :]
                else:
                    mask = jnp.asarray((v1 == qc) & (u1 >= 0), dtype=sdtype)
                    tgt = Umax
                    line = raw if raw.shape[0] == tgt else (
                        jnp.pad(raw[:tgt], (0, max(0, tgt - raw.shape[0]))))
                    line_b = line[:, None]
                fw_p = fw_p + mask * (line_b / b0[q])
                cw_p = cw_p + mask * (a0[q] / b0[q])
        fw_planes.append(fw_p)
        cw_planes.append(cw_p)
    fw = jnp.stack(fw_planes)
    cw = COURANT * jnp.stack(cw_planes)

    new_p = act * (csw + COURANT_SQ * fw + (cw - 1.0) * prev_s) / (1.0 + cw)

    # ghost-point DF2T state advance (each plane advances its own slot)
    a0b = a0[:, None, None]
    b0b = b0[:, None, None]
    delta = prev_s - new_p
    filt_in = -((a0b * delta) / (b0b * COURANT) + m0 / b0b)
    out = (filt_in * b0b + m0) / a0b
    bq = face_b[:, 1:].astype(sdtype)[:, None, None, :]
    aq = face_a[:, 1:].astype(sdtype)[:, None, None, :]
    shifted = jnp.concatenate(
        [st_s[..., 1:], jnp.zeros_like(st_s[..., :1])], axis=-1)
    new_st = shifted + bq * filt_in[..., None] - aq * out[..., None]
    return new_p, new_st


def plane_boundary_step_planes(cur_pl6, cur_in6, prev_pl6,
                               states: Sequence[Any], spec: BoxSpec,
                               face_b, face_a):
    """Tuple-API wrapper around the stacked update (oracle/tests).

    ``face_b``/``face_a``: (6, order+1) per-face impedance filter
    coefficients (traced — gradients w.r.t. materials flow through here).
    Returns (pplus: 6-tuple of (U, V) pressures, new_states: 6-tuple).

    Parity: reference ``program.cpp:331-388`` boundary update +
    ``filters.cpp`` canonical DF2T ghost-point state advance, with the 2-D /
    3-D nodes (edges/corners) expressed as membership in 2 / 3 planes.
    """
    sdtype = states[0].dtype
    out_dtype = cur_pl6[0].dtype
    pl_s = stack_planes(cur_pl6, spec, dtype=sdtype)
    in_s = stack_planes(cur_in6, spec, dtype=sdtype)
    prev_s = stack_planes(prev_pl6, spec, dtype=sdtype)
    st_s = stack_planes(states, spec)
    pplus_s, new_st_s = plane_boundary_step_stacked(
        pl_s, in_s, prev_s, st_s, spec, face_b, face_a)
    return (unstack_planes(pplus_s, spec, dtype=out_dtype),
            unstack_planes(new_st_s, spec))


# ---------------------------------------------------------------------------
# fused stencil + splice + inner-plane extraction
#
# The production step never slices the 3-D field on the XLA side (strided
# plane slices cost ~50 µs each on TPU): the kernel extracts the six INNER
# planes (first inside layer per wall — next step's ``cur_in``) as outputs,
# and the six boundary-plane pressures of the next field are by construction
# the spliced ``pplus`` (carried forward).  The kernel itself is a rolling-
# window stencil: grid step i receives ``cur`` block i (auto-pipelined, one
# HBM fetch per block — exactly 1× traffic), keeps the previous block and
# one tail plane in scratch, and computes slab i−1.  Total traffic: |cur| +
# |prev| + |next| = the 12 B/node speed-of-light model of bench.py.
# Clamped/garbage halo rows only ever touch all-outside rows (BoxSpec
# guarantees one outside plane at each x end), which the in-kernel inside
# mask zeroes.

def _inside_mask(gx, gy, gz, geom):
    return ((gx >= geom[3]) & (gx <= geom[4]) &
            (gy >= geom[5]) & (gy <= geom[6]) &
            (gz >= geom[7]) & (gz <= geom[8]))


def _coords(geom, j, Y, Z):
    gx = geom[0] + j * XT + \
        jax.lax.broadcasted_iota(jnp.int32, (XT, Y, Z), 0)
    gy = geom[1] + jax.lax.broadcasted_iota(jnp.int32, (XT, Y, Z), 1)
    gz = geom[2] + jax.lax.broadcasted_iota(jnp.int32, (XT, Y, Z), 2)
    return gx, gy, gz


def _yz_neighbor_acc(c):
    """±y and ±z neighbour sums of a (XT, Y, Z) block, zero fill."""
    zy = jnp.zeros_like(c[:, :1])
    acc = jnp.concatenate([zy, c[:, :-1]], axis=1)
    acc = acc + jnp.concatenate([c[:, 1:], zy], axis=1)
    zz = jnp.zeros_like(c[:, :, :1])
    acc = acc + jnp.concatenate([zz, c[:, :, :-1]], axis=2)
    acc = acc + jnp.concatenate([c[:, :, 1:], zz], axis=2)
    return acc


def _fwd_kernel(geom_ref, inj_ref, injv_ref, cur_ref, prev_ref,
                hlo_ref, hhi_ref,
                pxlo_ref, pxhi_ref, pylo_ref, pyhi_ref, pzlo_ref, pzhi_ref,
                out_ref, ixlo_ref, ixhi_ref, iylo_ref, iyhi_ref,
                izlo_ref, izhi_ref, slab, tail, *, spec, Y, Z, nb):
    """Forward step for one x-slab.

    y/z box geometry is compile-time static so outside bands are a single
    broadcast mask multiply, the y splices/extractions are cheap partial
    ref stores/reads at static rows, and only the x logic (which must stay
    dynamic for sharding: geom[0] is the shard's x offset) uses traced
    comparisons.  This keeps the kernel ≈15 VPU ops/element instead of the
    ~55 of a fully dynamic where/iota formulation.

    ``hlo_ref``/``hhi_ref``: (1, Y, Z) cur halo rows at local x = −1 and
    x = X (zeros for an unsharded mesh, neighbours' edge rows under
    shard_map domain decomposition).
    """
    i = pl.program_id(0)            # grid has nb+1 steps
    j = jnp.maximum(i - 1, 0)       # slab being computed
    s_blk = jnp.minimum(i, nb - 1)  # cur block arriving this step
    x_off = geom_ref[0]
    ilo, ihi = spec.ilo, spec.ihi
    blo = tuple(v - 1 for v in ilo)
    bhi = tuple(v + 1 for v in ihi)

    # in-kernel point-source injection (mode 0 none / 1 set / 2 add): an
    # XLA-level .at[].set on the 45 MB field costs a full copy (~0.14 ms);
    # here it is a conditional one-row patch
    sx, sy, sz, mode = inj_ref[0], inj_ref[1], inj_ref[2], inj_ref[3]
    v_now, v_prev = injv_ref[0], injv_ref[1]
    iy2 = jax.lax.broadcasted_iota(jnp.int32, (Y, 1), 0)
    iz2 = jax.lax.broadcasted_iota(jnp.int32, (1, Z), 1)
    src_yz = (iy2 == sy) & (iz2 == sz)

    @pl.when(i >= 1)
    def _():
        c = slab[...]                               # cur block j (injected)
        up = jnp.concatenate([tail[...], c[:-1]], axis=0)
        # down halo: first row of the arriving cur block, injection applied;
        # the last slab's down halo is the shard halo input instead
        dn_row = cur_ref[0:1]
        dn_row = jnp.where((sx == x_off + s_blk * XT) & (mode > 0)
                           & src_yz[None],
                           jnp.where(mode == 1, v_now, dn_row + v_now),
                           dn_row)
        dn_row = jnp.where(j == nb - 1, hhi_ref[...], dn_row)
        dn = jnp.concatenate([c[1:], dn_row], axis=0)
        acc = up + dn + _yz_neighbor_acc(c)

        # inside mask: x part traced (shard offset), y/z parts static
        gxr = x_off + j * XT + \
            jax.lax.broadcasted_iota(jnp.int32, (XT, 1, 1), 0)
        xm = ((gxr >= ilo[0]) & (gxr <= ihi[0]))
        iy = jax.lax.broadcasted_iota(jnp.int32, (1, Y, 1), 1)
        iz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Z), 2)
        m = xm & (iy >= ilo[1]) & (iy <= ihi[1]) \
            & (iz >= ilo[2]) & (iz <= ihi[2])
        res = jnp.where(m, COURANT_SQ * acc - prev_ref[...], 0.0)

        # z splices as lane selects (a single-lane ref store would need a
        # transpose); y and x splices as partial ref stores below
        row = pl.multiple_of(j * XT, XT)
        zsel_lo = iz == blo[2]
        zsel_hi = iz == bhi[2]
        res = jnp.where(zsel_lo, pzlo_ref[pl.ds(row, XT), :][:, :, None],
                        res)
        res = jnp.where(zsel_hi, pzhi_ref[pl.ds(row, XT), :][:, :, None],
                        res)
        out_ref[...] = res

        # prev enters only the node's own update (−prev term), so the
        # injected-previous correction is a single-row rewrite
        sx_loc = sx - x_off - j * XT

        @pl.when((mode > 0) & (sx_loc >= 0) & (sx_loc < XT))
        def _():
            # rows re-read from refs (dynamic_slice on values is not
            # lowerable); λ²·acc == res + prev recovers the set-mode term
            res_row = out_ref[sx_loc]
            prev_row = prev_ref[sx_loc]
            corr = jnp.where(mode == 1, res_row + prev_row - v_prev,
                             res_row - v_prev)
            out_ref[sx_loc] = jnp.where(src_yz, corr, res_row)

        # y splices — but the four y–z edge lines belong to the z planes
        # (splice precedence y < z < x), so patch those two entries of each
        # y row with the z planes' values before storing
        zlo_blk = pzlo_ref[pl.ds(row, XT), :]       # (XT, Y)
        zhi_blk = pzhi_ref[pl.ds(row, XT), :]
        iz2 = jax.lax.broadcasted_iota(jnp.int32, (1, Z), 1)

        def patched(y_row, yc):
            y_row = jnp.where(iz2 == blo[2], zlo_blk[:, yc:yc + 1], y_row)
            return jnp.where(iz2 == bhi[2], zhi_blk[:, yc:yc + 1], y_row)

        out_ref[:, blo[1], :] = patched(pylo_ref[pl.ds(row, XT), :], blo[1])
        out_ref[:, bhi[1], :] = patched(pyhi_ref[pl.ds(row, XT), :], bhi[1])

        # x-plane splices: final writer, conditional on owning slab
        xlo_loc = blo[0] - x_off
        xhi_loc = bhi[0] - x_off

        @pl.when(xlo_loc // XT == j)
        def _():
            out_ref[xlo_loc % XT] = pxlo_ref[...]

        @pl.when(xhi_loc // XT == j)
        def _():
            out_ref[xhi_loc % XT] = pxhi_ref[...]

        # inner-plane extraction (next step's cur_in) — static-row reads of
        # the finished output block
        iylo_ref[...] = out_ref[:, ilo[1], :]
        iyhi_ref[...] = out_ref[:, ihi[1], :]
        izlo_ref[...] = out_ref[:, :, ilo[2]]
        izhi_ref[...] = out_ref[:, :, ihi[2]]

        ixlo_loc = ilo[0] - x_off
        ixhi_loc = ihi[0] - x_off

        @pl.when(ixlo_loc // XT == j)
        def _():
            ixlo_ref[...] = out_ref[ixlo_loc % XT]

        @pl.when(ixhi_loc // XT == j)
        def _():
            ixhi_ref[...] = out_ref[ixhi_loc % XT]

    # roll the window; at i==0 the tail seeds from the shard halo (zeros for
    # an unsharded mesh, the left neighbour's edge row under shard_map)
    tail[...] = jnp.where(i == 0, hlo_ref[...], slab[XT - 1:XT])
    sx_arr = sx - x_off - s_blk * XT
    owns_arr = (mode > 0) & (sx_arr >= 0) & (sx_arr < XT)

    @pl.when(owns_arr)
    def _():
        blk = cur_ref[...]
        bx = jax.lax.broadcasted_iota(jnp.int32, (XT, 1, 1), 0)
        oh = (bx == sx_arr) & src_yz[None]
        slab[...] = jnp.where(oh, jnp.where(mode == 1, v_now, blk + v_now),
                              blk)

    @pl.when(jnp.logical_not(owns_arr))
    def _():
        slab[...] = cur_ref[...]


def _bwd_kernel(geom_ref, g_ref, gxlo_ref, gxhi_ref, gylo_ref, gyhi_ref,
                gzlo_ref, gzhi_ref,
                gcur_ref, gprev_ref, pxlo_ref, pxhi_ref, pylo_ref, pyhi_ref,
                pzlo_ref, pzhi_ref, ghlo_ref, ghhi_ref, slab, tail,
                *, Y, Z, nb):
    """Adjoint: ĝcur = λ²·Σ₆ shift(G), ĝprev = −G with
    G = M ⊙ (ĝnxt + one-hot placed inner-plane cotangents), plus the six
    boundary-plane cotangents (ĝnxt at plane coords under writer-precedence
    masks) as masked reductions.  ``ghlo``/``ghhi``: cotangents of the cur
    halo rows (λ²·G at the first/last local row — routed to neighbours by
    the transposed ppermute under shard_map)."""
    i = pl.program_id(0)
    s = jnp.minimum(i, nb - 1)      # slab whose G is built this step
    j = jnp.maximum(i - 1, 0)       # slab whose outputs are computed
    geom = [geom_ref[k] for k in range(9)]

    graw = g_ref[...]
    gx, gy, gz = _coords(geom, s, Y, Z)
    row = pl.multiple_of(s * XT, XT)
    G = graw
    G = G + jnp.where(gx == geom[3], gxlo_ref[...][None, :, :], 0.0)
    G = G + jnp.where(gx == geom[4], gxhi_ref[...][None, :, :], 0.0)
    G = G + jnp.where(gy == geom[5],
                      gylo_ref[pl.ds(row, XT), :][:, None, :], 0.0)
    G = G + jnp.where(gy == geom[6],
                      gyhi_ref[pl.ds(row, XT), :][:, None, :], 0.0)
    G = G + jnp.where(gz == geom[7],
                      gzlo_ref[pl.ds(row, XT), :][:, :, None], 0.0)
    G = G + jnp.where(gz == geom[8],
                      gzhi_ref[pl.ds(row, XT), :][:, :, None], 0.0)
    Gtot = G   # unmasked: inner-plane extraction also covers nodes that
    # lie on boundary planes (e.g. (ilo_x, blo_y, z)), so the splice-value
    # cotangents must include the one-hot inner contributions
    G = jnp.where(_inside_mask(gx, gy, gz, geom), G, 0.0)

    # boundary-plane cotangents for slab s (no halo needed; final-writer
    # masks follow the forward splice order y < z < x)
    blo = (geom[3] - 1, geom[5] - 1, geom[7] - 1)
    bhi = (geom[4] + 1, geom[6] + 1, geom[8] + 1)
    keep_y = (gx != blo[0]) & (gx != bhi[0]) & (gz != blo[2]) & \
        (gz != bhi[2])
    keep_z = (gx != blo[0]) & (gx != bhi[0])
    pylo_ref[...] = jnp.sum(
        jnp.where((gy == blo[1]) & keep_y, Gtot, 0.0), axis=1)
    pyhi_ref[...] = jnp.sum(
        jnp.where((gy == bhi[1]) & keep_y, Gtot, 0.0), axis=1)
    pzlo_ref[...] = jnp.sum(
        jnp.where((gz == blo[2]) & keep_z, Gtot, 0.0), axis=2)
    pzhi_ref[...] = jnp.sum(
        jnp.where((gz == bhi[2]) & keep_z, Gtot, 0.0), axis=2)

    # x-plane cotangents: the owner guards are LOCAL slab indices; zero-init
    # first so a shard that owns neither plane still emits zeros (garbage
    # here poisons the whole backward under shard_map)
    @pl.when(i == 0)
    def _():
        pxlo_ref[...] = jnp.zeros(pxlo_ref.shape, pxlo_ref.dtype)
        pxhi_ref[...] = jnp.zeros(pxhi_ref.shape, pxhi_ref.dtype)

    @pl.when(s == (blo[0] - geom[0]) // XT)
    def _():
        pxlo_ref[...] = jnp.sum(jnp.where(gx == blo[0], Gtot, 0.0), axis=0)

    @pl.when(s == (bhi[0] - geom[0]) // XT)
    def _():
        pxhi_ref[...] = jnp.sum(jnp.where(gx == bhi[0], Gtot, 0.0), axis=0)

    # cur-halo cotangents: hlo feeds only local row 0 (λ²·G[0]); hhi only
    # the last local row
    @pl.when(s == 0)
    def _():
        ghlo_ref[...] = COURANT_SQ * G[0:1]

    @pl.when(s == nb - 1)
    def _():
        ghhi_ref[...] = COURANT_SQ * G[XT - 1:XT]

    @pl.when(i >= 1)
    def _():
        c = slab[...]                               # G block j
        up = jnp.concatenate([tail[...], c[:-1]], axis=0)
        # true G is zero beyond the last grid row; G_s[0] is wrong there
        dn_halo = jnp.where(j == nb - 1, jnp.zeros_like(G[0:1]), G[0:1])
        dn = jnp.concatenate([c[1:], dn_halo], axis=0)
        gcur_ref[...] = COURANT_SQ * (up + dn + _yz_neighbor_acc(c))
        gprev_ref[...] = -c

    tail[...] = jnp.where(i == 0, jnp.zeros_like(slab[XT - 1:XT]),
                          slab[XT - 1:XT])
    slab[...] = G


def _plane_shapes(X, Y, Z):
    return ((Y, Z), (Y, Z), (X, Z), (X, Z), (X, Y), (X, Y))


def _pallas_forward(spec, geom, inj_idx, inj_val, cur, prev, halos, planes,
                    interpret=False):
    X, Y, Z = cur.shape
    nb = X // XT
    dt = cur.dtype
    blk3 = lambda im: pl.BlockSpec((XT, Y, Z), im,      # noqa: E731
                                   memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)   # noqa: E731
    j_map3 = lambda i, *g: (jnp.maximum(i - 1, 0), 0, 0)   # noqa: E731
    j_map2 = lambda i, *g: (jnp.maximum(i - 1, 0), 0)      # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb + 1,),
        in_specs=[
            blk3(lambda i, *g: (jnp.minimum(i, nb - 1), 0, 0)),  # cur
            blk3(j_map3),                                        # prev
            full(), full(),                                      # halos
            full(), full(), full(), full(), full(), full(),     # pplus
        ],
        out_specs=(
            blk3(j_map3),                                        # next
            full(), full(),                                      # ixlo/ixhi
            pl.BlockSpec((XT, Z), j_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((XT, Z), j_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((XT, Y), j_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((XT, Y), j_map2, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((XT, Y, Z), dt),
            pltpu.VMEM((1, Y, Z), dt),
        ],
    )
    shp = _plane_shapes(X, Y, Z)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec=spec, Y=Y, Z=Z, nb=nb),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((X, Y, Z), dt),) + tuple(
            jax.ShapeDtypeStruct(s, dt) for s in shp),
        # 64 MB scoped-VMEM cap (v5e has 128 MB): round 2 shipped a 17.5 MB
        # cap that the rematerialized forward inside the backward while-loop
        # exceeded by 1.38 MB (18.88 MB) — the r2 bench OOM.  The cap only
        # bounds what the compiler MAY allocate; measured step time is
        # identical at 17.5/64 MB.
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(geom, inj_idx, inj_val, cur, prev, halos[0], halos[1], *planes)
    return out[0], tuple(out[1:])


def _pallas_backward(geom, g, ginner, interpret=False):
    X, Y, Z = g.shape
    nb = X // XT
    dt = g.dtype
    blk3 = lambda im: pl.BlockSpec((XT, Y, Z), im,      # noqa: E731
                                   memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)   # noqa: E731
    j_map3 = lambda i, g_: (jnp.maximum(i - 1, 0), 0, 0)   # noqa: E731
    s_map2 = lambda i, g_: (jnp.minimum(i, nb - 1), 0)     # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb + 1,),
        in_specs=[
            blk3(lambda i, g_: (jnp.minimum(i, nb - 1), 0, 0)),  # g
            full(), full(), full(), full(), full(), full(),     # ginner
        ],
        out_specs=(
            blk3(j_map3),                                        # gcur
            blk3(j_map3),                                        # gprev
            full(), full(),                                      # gpxlo/hi
            pl.BlockSpec((XT, Z), s_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((XT, Z), s_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((XT, Y), s_map2, memory_space=pltpu.VMEM),
            pl.BlockSpec((XT, Y), s_map2, memory_space=pltpu.VMEM),
            full(), full(),                                      # ghalos
        ),
        scratch_shapes=[
            pltpu.VMEM((XT, Y, Z), dt),
            pltpu.VMEM((1, Y, Z), dt),
        ],
    )
    shp = _plane_shapes(X, Y, Z)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, Y=Y, Z=Z, nb=nb),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((X, Y, Z), dt),
                   jax.ShapeDtypeStruct((X, Y, Z), dt)) + tuple(
            jax.ShapeDtypeStruct(s, dt) for s in shp) + (
            jax.ShapeDtypeStruct((1, Y, Z), dt),
            jax.ShapeDtypeStruct((1, Y, Z), dt)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(geom, g, *ginner)
    return out[0], out[1], tuple(out[2:8]), (out[8], out[9])


def _jnp_forward(geom, cur, prev, planes, inj_idx=None, inj_val=None,
                 halos=None):
    """Reference/CPU implementation of the fused step."""
    from wayverb_tpu.waveguide.stencil import _neighbor_sum
    X, Y, Z = cur.shape
    gx = geom[0] + jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 0)
    gy = geom[1] + jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 1)
    gz = geom[2] + jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 2)
    if inj_idx is not None:
        oh = ((gx == inj_idx[0]) & (gy == inj_idx[1]) & (gz == inj_idx[2])
              & (inj_idx[3] > 0))
        cur = jnp.where(oh, jnp.where(inj_idx[3] == 1, inj_val[0],
                                      cur + inj_val[0]), cur)
        prev = jnp.where(oh, jnp.where(inj_idx[3] == 1, inj_val[1],
                                       prev + inj_val[1]), prev)
    ns = _neighbor_sum(cur)
    if halos is not None:
        ns = ns.at[0].add(halos[0][0]).at[-1].add(halos[1][0])
    res = jnp.where(_inside_mask(gx, gy, gz, geom),
                    COURANT_SQ * ns - prev, 0.0)
    pxlo, pxhi, pylo, pyhi, pzlo, pzhi = planes
    res = jnp.where(gy == geom[5] - 1, pylo[:, None, :], res)
    res = jnp.where(gy == geom[6] + 1, pyhi[:, None, :], res)
    res = jnp.where(gz == geom[7] - 1, pzlo[:, :, None], res)
    res = jnp.where(gz == geom[8] + 1, pzhi[:, :, None], res)
    res = jnp.where(gx == geom[3] - 1, pxlo[None, :, :], res)
    res = jnp.where(gx == geom[4] + 1, pxhi[None, :, :], res)
    # inner-plane coords are GLOBAL; local array index subtracts the shard
    # offset (geom[0..2]) — y/z offsets are 0 today, but the x offset is
    # live under shard_map (ADVICE r2 low)
    inner = tuple(
        jax.lax.dynamic_index_in_dim(res, geom[3 + 2 * a + s_] - geom[a], a,
                                     keepdims=False)
        for (a, s_) in PLANES)
    return res, inner


def use_fused_pallas(shape) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    X, Y, Z = shape
    return X % XT == 0 and Y % 8 == 0 and Z % 128 == 0


NO_INJECT = (np.zeros(4, np.int32), np.zeros(2, np.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 8))
def _fused_core(spec, geom, cur, prev, planes, inj_idx, inj_val, halos,
                interpret):
    if use_fused_pallas(cur.shape) or interpret:
        return _pallas_forward(spec, geom, inj_idx, inj_val, cur, prev,
                               halos, planes, interpret=interpret)
    return _jnp_forward(geom, cur, prev, planes, inj_idx, inj_val, halos)


def fused_step(spec, geom, cur, prev, planes, inj_idx=NO_INJECT[0],
               inj_val=NO_INJECT[1], halos=None, interpret=False):
    """(next, inner_planes) = stencil+splice+extract.

    Linear in (cur, prev, planes, halos); hand-written VJP (Pallas kernels
    are not auto-differentiable).  ``spec`` provides the static y/z box
    geometry; ``geom`` is the int32 vector from ``BoxSpec.geom_array``
    whose x offset may be traced (shard_map).  y/z offsets must be zero.

    ``inj_idx`` = (x, y, z, mode) with mode 0 none / 1 hard / 2 soft and
    ``inj_val`` = (value_now, value_prev) fold the point-source injection
    into the kernel (an XLA-level ``.at[].set`` on the field copies it).
    The VJP treats the injection VALUES as constant but zeroes the cur/prev
    cotangent at a hard-set node — differentiate through the XLA-level
    injection path (``make_box_body(kernel_inject=False)``) for gradients
    w.r.t. the source signal.

    ``halos``: optional (hlo, hhi) pair of (1, Y, Z) cur rows at local
    x = −1 / x = X for shard_map domain decomposition (zeros when omitted;
    the global mesh guarantees all-outside rows at the grid ends).
    """
    if halos is None:
        z = jnp.zeros((1,) + cur.shape[1:], cur.dtype)
        halos = (z, z)
    return _fused_core(spec, geom, cur, prev, planes, inj_idx, inj_val,
                       halos, interpret)


def _fused_fwd(spec, geom, cur, prev, planes, inj_idx, inj_val, halos,
               interpret):
    return _fused_core(spec, geom, cur, prev, planes, inj_idx, inj_val,
                       halos, interpret), (geom, inj_idx)


def _fused_bwd(spec, interpret, res, cot):
    geom, inj_idx = res
    g, ginner = cot
    if use_fused_pallas(g.shape) or interpret:
        gcur, gprev, gplanes, ghalos = _pallas_backward(
            geom, g, ginner, interpret=interpret)
    else:
        from wayverb_tpu.waveguide.stencil import _neighbor_sum
        X, Y, Z = g.shape
        gx = geom[0] + jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 0)
        gy = geom[1] + jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 1)
        gz = geom[2] + jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 2)
        G = g
        G = G + jnp.where(gx == geom[3], ginner[0][None, :, :], 0.0)
        G = G + jnp.where(gx == geom[4], ginner[1][None, :, :], 0.0)
        G = G + jnp.where(gy == geom[5], ginner[2][:, None, :], 0.0)
        G = G + jnp.where(gy == geom[6], ginner[3][:, None, :], 0.0)
        G = G + jnp.where(gz == geom[7], ginner[4][:, :, None], 0.0)
        G = G + jnp.where(gz == geom[8], ginner[5][:, :, None], 0.0)
        Gtot = G
        G = jnp.where(_inside_mask(gx, gy, gz, geom), G, 0.0)
        gcur = COURANT_SQ * _neighbor_sum(G)
        gprev = -G
        ghalos = (COURANT_SQ * G[0:1], COURANT_SQ * G[-1:])

        blo = (geom[3] - 1, geom[5] - 1, geom[7] - 1)
        bhi = (geom[4] + 1, geom[6] + 1, geom[8] + 1)

        def plane_grad(axis, coord, kill):
            # localize; planes whose coordinate lies outside this shard get
            # ZERO cotangent (dynamic_index clamps, so without the mask a
            # non-owner shard would emit garbage — the sharded-grad bug)
            c = coord - geom[axis]
            valid = (c >= 0) & (c < Gtot.shape[axis])
            sl = jax.lax.dynamic_index_in_dim(Gtot, c, axis,
                                              keepdims=False)
            U, V = sl.shape
            iu = jax.lax.broadcasted_iota(jnp.int32, (U, V), 0)
            iv = jax.lax.broadcasted_iota(jnp.int32, (U, V), 1)
            keep = jnp.full((U, V), True) & valid
            for k_axis, k_coord in kill:
                it = iu if k_axis == 0 else iv
                keep = keep & (it != k_coord)
            return jnp.where(keep, sl, 0.0)

        # kill coords on the slice's x axis are localized (x offset under
        # shard_map); y/z offsets are always 0
        xlo_l, xhi_l = blo[0] - geom[0], bhi[0] - geom[0]
        gplanes = (
            plane_grad(0, blo[0], ()),
            plane_grad(0, bhi[0], ()),
            plane_grad(1, blo[1], ((0, xlo_l), (0, xhi_l),
                                   (1, blo[2]), (1, bhi[2]))),
            plane_grad(1, bhi[1], ((0, xlo_l), (0, xhi_l),
                                   (1, blo[2]), (1, bhi[2]))),
            plane_grad(2, blo[2], ((0, xlo_l), (0, xhi_l))),
            plane_grad(2, bhi[2], ((0, xlo_l), (0, xhi_l))),
        )
    # a hard-set (mode 1) injection overwrites cur/prev at the source node,
    # so no cotangent flows through the pre-injection values there (ADVICE
    # r2: without this, HardSource gradients through the default box path
    # leak through the clamped node).  Soft (mode 2) adds — pass-through.
    sx = inj_idx[0] - geom[0]
    keep = jnp.where(inj_idx[3] == 1, 0.0, 1.0).astype(gcur.dtype)
    gcur = gcur.at[sx, inj_idx[1], inj_idx[2]].mul(keep)
    gprev = gprev.at[sx, inj_idx[1], inj_idx[2]].mul(keep)
    ggeom = np.zeros(geom.shape, dtype=jax.dtypes.float0)
    ginj_idx = np.zeros(4, dtype=jax.dtypes.float0)
    ginj_val = jnp.zeros(2, dtype=jnp.float32)
    return ggeom, gcur, gprev, gplanes, ginj_idx, ginj_val, ghalos


_fused_core.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# scan-body machinery shared by run.run_waveguide_box and checkpoint

class _InjectedView:
    """Read-only view of the flat field with the pending in-kernel injection
    applied to every read.

    In kernel-inject mode the field array the receiver taps is
    PRE-injection (the kernel applies the source while computing the next
    step), so taps at the source node would diverge from the XLA-inject /
    gather / region paths.  Receivers only read via ``field[idx]``; routing
    those reads through ``source.patch_tap`` restores post-injection
    semantics for any node set (ADVICE r2).
    """

    def __init__(self, field_flat, source, t):
        self._field = field_flat
        self._source = source
        self._t = t

    def __getitem__(self, idx):
        return self._source.patch_tap(idx, self._field[idx], self._t)


def initial_box_boundary(spec: BoxSpec, order: int, dtype=jnp.float32,
                         state_dtype=None):
    """Boundary carry: (pl_s, in6, prev_pl_s, st_s).

    ``pl_s``: stacked (6, Umax, Vmax) field values at the six boundary
    planes (== last step's pplus); ``in6``: 6-tuple of field values at the
    inner planes (kernel-extracted, true shapes); ``prev_pl_s``: previous
    field's boundary-plane values (stacked); ``st_s``: stacked
    (6, Umax, Vmax, order) IIR ghost-point state.
    """
    sdtype = state_dtype if state_dtype is not None else dtype
    Umax, Vmax = stacked_plane_shape(spec)
    zstack = jnp.zeros((6, Umax, Vmax), dtype=dtype)
    in6 = tuple(jnp.zeros(spec.plane_shape(p), dtype=dtype)
                for p in range(6))
    return (zstack, in6, zstack,
            jnp.zeros((6, Umax, Vmax, order), dtype=sdtype))


def make_box_body(structure, spec: BoxSpec, source, receiver,
                  geom=None, kernel_inject: bool = True):
    """Scan body for the fused box solver.

    carry: (cur, prev, (pl_s, in6, prev_pl_s, st_s), rstate, ok)

    ``kernel_inject``: point sources (Hard/Soft) inject INSIDE the fused
    kernel (an XLA ``.at[].set`` on the field costs a full copy per step).
    The kernel path treats the injection as constant in the VJP, but the
    VJP zeroes the cur/prev cotangent at a hard-set node, so material
    gradients through the default path are exact; for gradients w.r.t. the
    source signal itself pass ``kernel_inject=False`` (the XLA injection
    differentiates w.r.t. everything).
    """
    dims = spec.dims
    num_nodes = dims[0] * dims[1] * dims[2]
    face_idx = jnp.asarray(spec.face_surface, dtype=jnp.int32)
    face_b = structure.coef_b[face_idx]
    face_a = structure.coef_a[face_idx]
    if geom is None:
        geom = spec.geom_array()
    use_kernel_inject = kernel_inject and hasattr(source,
                                                  "kernel_injection")

    def body(carry, t):
        current, previous, bcarry, rstate, ok = carry
        pl_s, in6, prev_pl_s, st_s = bcarry
        fdtype = current.dtype

        if use_kernel_inject:
            inj_idx, inj_val = source.kernel_injection(dims, t)
            tap_field = _InjectedView(current.reshape(num_nodes), source, t)
        else:
            inj_idx, inj_val = NO_INJECT
            cur_flat = source.inject(current.reshape(num_nodes), t)
            current = cur_flat.reshape(dims)
            tap_field = current.reshape(num_nodes)

        # mirror the injection onto the carried inner planes (a source at
        # an inner-layer node must be visible to the boundary update)
        in_s = stack_planes(in6, spec, dtype=fdtype)
        if hasattr(source, "patch_planes_stacked"):
            in_s = source.patch_planes_stacked(in_s, spec, dims, t)
        else:
            in6 = tuple(
                source.patch_plane(in6[pi], a,
                                   spec.ilo[a] if s == 0 else spec.ihi[a],
                                   dims, t)
                for pi, (a, s) in enumerate(PLANES))
            in_s = stack_planes(in6, spec, dtype=fdtype)
        rstate, outputs = receiver.tap(tap_field, rstate)

        pplus_s, st_s = plane_boundary_step_stacked(
            pl_s, in_s, prev_pl_s, st_s, spec, face_b, face_a)
        pplus_s = pplus_s.astype(fdtype)
        pplus = unstack_planes(pplus_s, spec)
        nxt, in6_next = fused_step(spec, geom, current, previous, pplus,
                                   inj_idx, inj_val)
        # instability in the filtered-boundary FDTD mesh manifests at the
        # boundary planes first (the interior update is marginally stable at
        # the Courant limit), so a plane-sum check is an O(n²) stand-in for
        # the reference's per-node error flag; run_waveguide_box adds a
        # full-field isfinite on the final state (an interior NaN persists)
        ok = ok & jnp.isfinite(jnp.sum(pplus_s))
        new_carry = (nxt, current, (pplus_s, in6_next, pl_s, st_s),
                     rstate, ok)
        return new_carry, outputs

    return body


def initial_box_carry(structure, spec: BoxSpec, receiver,
                      dtype=jnp.float32, state_dtype=None):
    dims = spec.dims
    return (jnp.zeros(dims, dtype=dtype), jnp.zeros(dims, dtype=dtype),
            initial_box_boundary(spec, structure.filter_order, dtype,
                                 state_dtype),
            receiver.init_state(dtype), jnp.asarray(True))
