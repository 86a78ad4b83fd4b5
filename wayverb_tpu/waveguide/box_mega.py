"""VMEM-resident multi-step shoebox waveguide: the round-4 "mega-kernel".

Round 3's fused path (box_fused.py) streams the whole field HBM→VMEM→HBM
every step — by construction it cannot beat HBM speed-of-light (measured
52.8% of 6.83e10 upd/s on v5e).  This module removes the HBM wall entirely:
the full pressure-field ping-pong (2 × (X, Y, Z) f32) plus the boundary
IIR filter state live in VMEM *scratch* for K consecutive time steps per
``pallas_call``.  Per-chunk HBM traffic is 2 field loads + 2 field stores,
amortized to ~(4/K) fields per step, so the solver becomes VMEM-bandwidth
bound: 1.2e11 node-updates/s measured for the bare stencil at 224×224×256
— ~1.8× the HBM speed-of-light roofline of the one-step design
(tools/bench/probe_vmem_resident.py).

Because the field is resident, the boundary-plane pressures that round 3
carried between steps (to avoid ~50 µs XLA strided plane slices) are now
just in-kernel static slices of the resident buffers; the ONLY carried
boundary state is the ghost-point DF2T filter state.  Everything else —
source injection, receiver taps, the six plane updates (reference
``src/waveguide/src/program.cpp:331-388`` + ``filters.cpp`` canonical
DF2T), the interior stencil and the plane splices — happens inside the
kernel, one sub-step after another.

Receiver taps leave the kernel as a (K, k) pressure block (k = the
receiver's tap nodes, ``receiver.tap_nodes()``); the receiver's own
arithmetic (velocity integration etc.) replays over that series
afterwards at O(T·k) cost.

**Differentiation** (w.r.t. face filter coefficients AND the source
signal) is a hand-built chunk-level custom VJP.  The wave operator is
self-adjoint, so the adjoint recursion is ANOTHER leapfrog with the same
in-place two-buffer VMEM structure.  The boundary-plane transpose runs
inside the backward kernel by ``jax.vjp``-ing the SAME pure-jnp plane
function ONE PLANE AT A TIME at ZERO primals (the plane step is linear
in every pressure/state input, so those cotangents are exact without
residuals); the θ gradients — the only primal-dependent piece — are
recovered OUTSIDE the kernel by differentiating the XLA-level inner
product of the streamed output cotangents against the per-step plane
residuals (pl, in, prev, m0 — ~5.5 MB/step) the grad-mode forward
kernel streams to HBM.  This split is what fits the adjoint in VMEM at
the flagship 224×224×256 (round 5); backward HBM traffic is
~(4 fields / K) + residual/cotangent streams per step — the backward
runs at the same VMEM-bound speed class as the forward.

Capacity: 2·|field| + |state| + |plane scratch| must fit in ~119 MB of
v5e VMEM (128 MB minus compiler slack) — ``mega_supported`` checks this;
larger meshes fall back to the streaming fused path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wayverb_tpu.waveguide.box_fused import (PLANES, BoxSpec, _other_axes,
                                             stacked_plane_shape)
from wayverb_tpu.waveguide.descriptor import COURANT, COURANT_SQ

XT = 8          # x rows per stencil slab
VMEM_BUDGET = 119 * 1024 * 1024   # leave ~9 MB of 128 MB for the compiler


def _make_shift2():
    """arr[i] = arr_old[i + delta], zero fill (2-D plane arrays).

    Mosaic cannot lower slice+concat on 2-D planes whose slice offset
    breaks the (8, 128) tile alignment ("offset mismatch on non-concat
    dimension"), so the shift is a circular roll with the wrapped line
    masked to zero.  custom_vjp because ``pltpu.roll`` has no AD rule and
    the transpose of shift(+1) is simply shift(−1) — this keeps the plane
    math differentiable both at the XLA level and inside the backward
    kernel's in-kernel ``jax.vjp``.
    """
    @functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
    def shift2(arr, axis: int, delta: int, kernel: bool = True):
        if kernel:
            n = arr.shape[axis]
            idx = jax.lax.broadcasted_iota(jnp.int32, arr.shape, axis)
            if delta == -1:
                return jnp.where(idx == 0, 0.0, pltpu.roll(arr, 1, axis))
            return jnp.where(idx == n - 1, 0.0,
                             pltpu.roll(arr, n - 1, axis))
        # XLA level (pltpu.roll only lowers inside TPU kernels)
        z = jnp.zeros_like(jax.lax.slice_in_dim(arr, 0, 1, axis=axis))
        if delta == -1:
            body = jax.lax.slice_in_dim(arr, 0, arr.shape[axis] - 1,
                                        axis=axis)
            return jnp.concatenate([z, body], axis=axis)
        body = jax.lax.slice_in_dim(arr, 1, arr.shape[axis], axis=axis)
        return jnp.concatenate([body, z], axis=axis)

    def fwd(arr, axis, delta, kernel):
        return shift2(arr, axis, delta, kernel), None

    def bwd(axis, delta, kernel, _, g):
        return (shift2(g, axis, -delta, kernel),)

    shift2.defvjp(fwd, bwd)
    return shift2


_shift2 = _make_shift2()


def _plane_of(buf, axis: int, coord: int):
    """Static 2-D plane slice of a resident (X, Y, Z) ref or array."""
    if axis == 0:
        return buf[coord]
    if axis == 1:
        return buf[:, coord, :]
    return buf[:, :, coord]


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


# ---------------------------------------------------------------------------
# boundary-plane step: ONE pure-jnp implementation shared by the forward
# kernel, the backward kernel (via in-kernel jax.vjp) and tests

import os as _os
_MEGA_DEBUG = _os.environ.get("WAYVERB_MEGA_DEBUG", "")


def plane_step_one(spec: BoxSpec, pi: int, pl_p, in_p, prev_p, m0_6,
                   st_hi, fb, fa, kernel: bool = True):
    """ONE plane's boundary update on natural-shape arrays.

    ``pl_p``/``in_p``/``prev_p``: (U, V) pressures at plane ``pi``'s
    boundary / first-inside / previous-boundary planes; ``m0_6``: 6-tuple
    of every plane's first DF2T state slot (edge coupling reads the
    neighbours'); ``st_hi``: plane ``pi``'s higher slots (order−1, U, V);
    ``fb``/``fa``: (6, order+1) per-face impedance filter coefficients.

    Returns ``(new_p, newst)`` with ``newst`` (order, U, V).  Pure jnp
    with Mosaic-lowerable ops only, differentiable (``_shift2`` carries a
    custom VJP), linear in all pressures/state — so its ``jax.vjp`` at a
    primal point with the true m₀ but zeroed higher slots yields EXACT
    cotangents (the higher slots enter linearly with coefficient-
    independent weights).  The backward kernel vjp-s this PER PLANE: one
    plane's trace keeps ~6× less live scratch than the fused six-plane
    function (the r4 backward's VMEM overflow at 224³, MEGA_NOTES.md).

    Parity: reference ``program.cpp:331-388`` boundary update +
    ``filters.cpp`` canonical DF2T ghost-point advance; oracle:
    box_fused.plane_boundary_step_stacked (tests/test_box_mega.py).
    """
    order = st_hi.shape[0] + 1
    blo = tuple(spec.ilo[a] - 1 for a in range(3))
    bhi = tuple(spec.ihi[a] + 1 for a in range(3))
    b0 = [fb[p, 0] for p in range(6)]
    a0 = [fa[p, 0] for p in range(6)]

    a, side = PLANES[pi]
    a1, a2 = _other_axes(a)
    U, V = spec.plane_shape(pi)
    pc = blo[a] if side == 0 else bhi[a]
    m0 = m0_6[pi]

    u = _iota((U, V), 0)
    v = _iota((U, V), 1)
    act = ((u >= blo[a1]) & (u <= bhi[a1]) &
           (v >= blo[a2]) & (v <= bhi[a2])).astype(pl_p.dtype)
    w_um = jnp.where(u == blo[a1], 0.0,
                     jnp.where(u == bhi[a1], 2.0, 1.0))
    w_up = jnp.where(u == blo[a1], 2.0,
                     jnp.where(u == bhi[a1], 0.0, 1.0))
    w_vm = jnp.where(v == blo[a2], 0.0,
                     jnp.where(v == bhi[a2], 2.0, 1.0))
    w_vp = jnp.where(v == blo[a2], 2.0,
                     jnp.where(v == bhi[a2], 0.0, 1.0))

    csw = COURANT_SQ * (2.0 * in_p
                        + w_um * _shift2(pl_p, 0, -1, kernel)
                        + w_up * _shift2(pl_p, 0, +1, kernel)
                        + w_vm * _shift2(pl_p, 1, -1, kernel)
                        + w_vp * _shift2(pl_p, 1, +1, kernel))

    fw = m0 / b0[pi]
    cw = jnp.full((U, V), a0[pi] / b0[pi])
    # edge/corner coupling: nodes on this plane's in-plane box edges
    # also belong to the neighbouring plane(s); the ghost closure sums
    # each member plane's filter contribution
    for edge_axis, on_rows in (
            () if "nocouple" in _MEGA_DEBUG
            else ((a1, True), (a2, False))):
        for s2 in (0, 1):
            q = PLANES.index((edge_axis, s2))
            qc = blo[edge_axis] if s2 == 0 else bhi[edge_axis]
            qa = _other_axes(edge_axis)
            # keep the coupling lines 2-D ((1, V) / (U, 1)) — 1-D
            # vectors force Mosaic relayouts and blow up compile
            line = (m0_6[q][pc:pc + 1, :] if a == qa[0]
                    else m0_6[q][:, pc:pc + 1])
            if on_rows:
                mask = (u == qc).astype(pl_p.dtype)
                if line.shape[0] != 1:
                    line = line.T
            else:
                mask = (v == qc).astype(pl_p.dtype)
                if line.shape[1] != 1:
                    line = line.T
            fw = fw + mask * (line / b0[q])
            cw = cw + mask * (a0[q] / b0[q])
    cw = COURANT * cw

    new_p = act * (csw + COURANT_SQ * fw + (cw - 1.0) * prev_p) \
        / (1.0 + cw)
    delta = prev_p - new_p
    filt_in = -((a0[pi] * delta) / (b0[pi] * COURANT) + m0 / b0[pi])
    out = (filt_in * b0[pi] + m0) / a0[pi]

    slots = []
    for j in range(order):
        if "nodf2t" in _MEGA_DEBUG:
            slots.append(m0 if j == 0 else st_hi[j - 1])
            continue
        nxt = (st_hi[j] if j + 1 < order
               else jnp.zeros((U, V), filt_in.dtype))
        slots.append(nxt + fb[pi, j + 1] * filt_in
                     - fa[pi, j + 1] * out)
    return new_p, jnp.stack(slots, axis=0)


def plane_step_natural(spec: BoxSpec, pl6, in6, prev6, st6, fb, fa,
                       kernel: bool = True):
    """The six boundary-plane updates on natural-shape arrays (wrapper
    over :func:`plane_step_one`; see there for semantics/parity)."""
    pplus, newst = [], []
    m0_6 = tuple(st6[p][0] for p in range(6))
    for pi in range(6):
        new_p, ns = plane_step_one(spec, pi, pl6[pi], in6[pi], prev6[pi],
                                   m0_6, st6[pi][1:], fb, fa, kernel)
        pplus.append(new_p)
        newst.append(ns)
    return tuple(pplus), tuple(newst)


# ---------------------------------------------------------------------------
# forward kernel

class _MegaKernel:
    """K-sub-step forward kernel for one static BoxSpec/K/k/order.

    ``grad=True`` additionally streams per-sub-step plane residuals
    (pl, in, prev, m0) to an HBM output for the backward kernel.
    """

    def __init__(self, spec: BoxSpec, K: int, k: int, order: int,
                 src, taps, grad: bool = False):
        if K % 2:
            raise ValueError("chunk length K must be even")
        if k < 1:
            raise ValueError("receiver must tap at least one node")
        self.spec, self.K, self.k, self.order = spec, K, k, order
        # source (x, y, z, mode) and receiver tap (x, y, z) coordinates
        # are STATIC python ints: dynamic per-element indexing of the big
        # resident refs costs ~50 us per op in Mosaic (it dominated the
        # first bench at ~400 us/step); static rows are free.  Moving a
        # source/receiver recompiles (cached per placement).
        self.src = tuple(int(v) for v in src)
        self.taps = tuple(tuple(int(v) for v in t) for t in taps)
        self.grad = grad
        X, Y, Z = spec.dims
        if X % XT or Y % 8 or Z % 128:
            raise ValueError(f"dims {spec.dims} not tile-aligned")
        self.Umax, self.Vmax = stacked_plane_shape(spec)

    # -- carried planes ------------------------------------------------
    # Boundary/inner plane pressures are CARRIED in per-plane 2-D scratch
    # (PL = boundary planes of the current field, INS = first-inside
    # planes, PRVP = boundary planes of the previous field) and extracted
    # slab-wise from the freshly computed field inside the stencil loop —
    # whole-array lane/sublane plane slices of the big resident refs
    # (A[:, :, pc] etc.) are the Mosaic compile/runtime cliff documented
    # in MEGA_NOTES.md; 8-row slab extractions are the r3 streaming
    # kernel's proven-fast pattern.

    def _read_st(self, STS):
        # per-slot 2-D reads + an axis-0 stack: a rank-4 ref slice through
        # two sliced dims (STS[:, pi, :U, :V]) sends the Mosaic compiler
        # into the weeds (>45 min at any size; the per-slot form compiles
        # in ~1 min)
        return tuple(
            jnp.stack([STS[j, pi, :U, :V] for j in range(self.order)])
            for pi, (U, V) in enumerate(
                self.spec.plane_shape(p) for p in range(6)))

    def _substep_bare(self, A, B):
        """Debug-only: interior stencil without any boundary machinery."""
        spec = self.spec
        X, Y, Z = spec.dims
        nb = X // XT
        ilo, ihi = spec.ilo, spec.ihi
        iy = _iota((1, Y, 1), 1)
        iz = _iota((1, 1, Z), 2)
        yz_m = ((iy >= ilo[1]) & (iy <= ihi[1]) &
                (iz >= ilo[2]) & (iz <= ihi[2]))

        def slab(j, _):
            r = pl.multiple_of(j * XT, XT)
            c = A[pl.ds(r, XT)]
            up_row = jnp.where(j == 0, jnp.zeros((1, Y, Z), c.dtype),
                               A[pl.ds(jnp.maximum(r - 1, 0), 1)])
            dn_row = jnp.where(j == nb - 1, jnp.zeros((1, Y, Z), c.dtype),
                               A[pl.ds(jnp.minimum(r + XT, X - 1), 1)])
            acc = jnp.concatenate([up_row, c[:-1]], axis=0) \
                + jnp.concatenate([c[1:], dn_row], axis=0)
            zy = jnp.zeros_like(c[:, :1])
            acc = acc + jnp.concatenate([zy, c[:, :-1]], axis=1)
            acc = acc + jnp.concatenate([c[:, 1:], zy], axis=1)
            zz = jnp.zeros_like(c[:, :, :1])
            acc = acc + jnp.concatenate([zz, c[:, :, :-1]], axis=2)
            acc = acc + jnp.concatenate([c[:, :, 1:], zz], axis=2)
            gxr = r + _iota((XT, 1, 1), 0)
            m = (gxr >= ilo[0]) & (gxr <= ihi[0]) & yz_m
            B[pl.ds(r, XT)] = jnp.where(
                m, COURANT_SQ * acc - B[pl.ds(r, XT)], 0.0)
            return 0

        jax.lax.fori_loop(0, nb, slab, 0)

    def _patch_ins(self, INS, sig_t):
        """Mirror the (static-coordinate) injection onto the carried
        inner planes — the extraction ran before this sub-step's
        injection touched the field."""
        spec = self.spec
        sx, sy, sz, mode = self.src
        if mode == 0:
            return
        src_xyz = (sx, sy, sz)
        for pi, (a, side) in enumerate(PLANES):
            coord = spec.ilo[a] if side == 0 else spec.ihi[a]
            if src_xyz[a] != coord:
                continue
            a1, a2 = _other_axes(a)
            u, v = src_xyz[a1], src_xyz[a2]
            V = spec.plane_shape(pi)[1]
            lane_v = _iota((1, V), 1)
            # Slice the ACTIVE region only: INS rows are padded to Vmax
            # (DMA lane alignment), and a full-width read would broadcast
            # against the V-wide lane mask (crash for z-planes, V < Vmax).
            row = INS[pi][u:u + 1, :V]
            patched = sig_t if mode == 1 else row + sig_t
            INS[pi][u:u + 1, :V] = jnp.where(lane_v == v, patched, row)

    # -- one leapfrog sub-step ------------------------------------------
    def _substep(self, A, B, STS, PL, INS, PRVP, fb, fa, sig_t, taps_out,
                 t, res_hbm, res_stage, sems):
        """B <- next field (in place over previous); writes the tap row
        and returns this sub-step's badness contribution."""
        spec = self.spec
        X, Y, Z = spec.dims
        nb = X // XT
        ilo, ihi = spec.ilo, spec.ihi
        blo = tuple(v - 1 for v in ilo)
        bhi = tuple(v + 1 for v in ihi)

        # source injection into the resident current buffer (static row)
        sx, sy, sz, mode = self.src
        lane = _iota((1, 1, Z), 2)
        if mode > 0:
            row = A[sx:sx + 1, sy:sy + 1, :]
            patched = sig_t if mode == 1 else row + sig_t
            A[sx:sx + 1, sy:sy + 1, :] = jnp.where(lane == sz, patched,
                                                   row)

        # receiver taps (post-injection, matching run.py semantics)
        tvals = []
        for (tx, ty, tz) in self.taps:
            trow = A[tx:tx + 1, ty:ty + 1, :]
            tvals.append(jnp.sum(jnp.where(lane == tz, trow, 0.0)))
        taps_out[pl.ds(t, 1), :] = jnp.stack(tvals)[None, :]

        if "noplane" in _MEGA_DEBUG:
            self._substep_bare(A, B)
            return jnp.float32(0.0)

        self._patch_ins(INS, sig_t)
        fbv, fav = fb[...], fa[...]
        shp = [spec.plane_shape(pi) for pi in range(6)]

        res_cp = None
        if self.grad:
            # capture (pl, in, prev, m0) for the θ-gradient phase into
            # the (4, 6, Umax, Vmax) staging buffer and stream it with
            # ONE DMA that overlaps the plane + stencil work below
            # (awaited at the end of the sub-step; per-plane direct
            # DMAs to the dynamically-indexed HBM target cost Mosaic a
            # bounce allocation per transfer — measured: 19 direct DMAs
            # regressed the capacity cliff from 224³ to 216³)
            for role, refs in ((0, PL), (1, INS), (2, PRVP)):
                for pi in range(6):
                    res_stage[role, pi] = refs[pi][...]
            res_stage[3] = STS[0]
            res_cp = pltpu.make_async_copy(res_stage, res_hbm.at[t],
                                           sems.at[3])
            res_cp.start()

        if self.grad:
            # ONE PLANE AT A TIME, results written back immediately —
            # the whole-six-plane plane_step_natural trace keeps ~6× the
            # live intermediates and overflowed VMEM at 224³ alongside
            # the residual staging; the non-grad kernel keeps the
            # monolithic trace (it fits and runs ~15 µs/step faster).
            # The m₀ planes are snapshotted up front (each plane's
            # coupling reads its neighbours' OLD m₀), so the in-place
            # STS writes per plane are safe; plane pi's own pl/in/prev
            # reads happen before its PL/PRVP write-back.
            m0_6 = tuple(STS[0, pi, :U, :V]
                         for pi, (U, V) in enumerate(shp))
            bad = jnp.float32(0.0)
            for pi in range(6):
                U, V = shp[pi]
                st_hi = jnp.stack([STS[j, pi, :U, :V]
                                   for j in range(1, self.order)])
                new_p, newst = plane_step_one(
                    spec, pi, PL[pi][:U, :V], INS[pi][:U, :V],
                    PRVP[pi][:U, :V], m0_6, st_hi, fbv, fav)
                for j in range(self.order):
                    STS[j, pi, :U, :V] = newst[j]
                # PRVP <- old PL, then PL <- new_p: PL now holds this
                # step's computed boundary pressures (read below by the
                # splices and carried as next sub-step's boundary planes)
                PRVP[pi][...] = PL[pi][...]
                PL[pi][:U, :V] = new_p
                bad = bad + (1.0 - jnp.isfinite(jnp.sum(new_p))
                             .astype(jnp.float32))
        else:
            pl6 = tuple(PL[pi][:U, :V] for pi, (U, V) in enumerate(shp))
            in6 = tuple(INS[pi][:U, :V] for pi, (U, V) in enumerate(shp))
            prev6 = tuple(PRVP[pi][:U, :V]
                          for pi, (U, V) in enumerate(shp))
            st6 = self._read_st(STS)
            pplus, newst6 = plane_step_natural(spec, pl6, in6, prev6,
                                               st6, fbv, fav)
            bad = jnp.float32(0.0)
            for pi in range(6):
                U, V = shp[pi]
                for j in range(self.order):
                    STS[j, pi, :U, :V] = newst6[pi][j]
                PRVP[pi][...] = PL[pi][...]
                PL[pi][:U, :V] = pplus[pi]
                bad = bad + (1.0 - jnp.isfinite(jnp.sum(pplus[pi]))
                             .astype(jnp.float32))

        # interior stencil + splices + slab-wise inner-plane extraction
        # (splice precedence y < z < x mirrors box_fused._fwd_kernel)
        iy = _iota((1, Y, 1), 1)
        iz = _iota((1, 1, Z), 2)
        yz_m = ((iy >= ilo[1]) & (iy <= ihi[1]) &
                (iz >= ilo[2]) & (iz <= ihi[2]))

        def slab(j, _):
            r = pl.multiple_of(j * XT, XT)
            c = A[pl.ds(r, XT)]
            up_row = jnp.where(j == 0, jnp.zeros((1, Y, Z), c.dtype),
                               A[pl.ds(jnp.maximum(r - 1, 0), 1)])
            dn_row = jnp.where(j == nb - 1, jnp.zeros((1, Y, Z), c.dtype),
                               A[pl.ds(jnp.minimum(r + XT, X - 1), 1)])
            acc = jnp.concatenate([up_row, c[:-1]], axis=0) \
                + jnp.concatenate([c[1:], dn_row], axis=0)
            zy = jnp.zeros_like(c[:, :1])
            acc = acc + jnp.concatenate([zy, c[:, :-1]], axis=1)
            acc = acc + jnp.concatenate([c[:, 1:], zy], axis=1)
            zz = jnp.zeros_like(c[:, :, :1])
            acc = acc + jnp.concatenate([zz, c[:, :, :-1]], axis=2)
            acc = acc + jnp.concatenate([c[:, :, 1:], zz], axis=2)

            gxr = r + _iota((XT, 1, 1), 0)
            m = (gxr >= ilo[0]) & (gxr <= ihi[0]) & yz_m
            res = jnp.where(m, COURANT_SQ * acc - B[pl.ds(r, XT)], 0.0)

            # z-plane splices as lane selects
            res = jnp.where(iz == blo[2],
                            PL[4][pl.ds(r, XT), :Y][:, :, None], res)
            res = jnp.where(iz == bhi[2],
                            PL[5][pl.ds(r, XT), :Y][:, :, None], res)
            bs = B.at[pl.ds(r, XT)]
            bs[...] = res

            # y splices as row stores, z-edge lines patched with the z
            # planes' values (precedence)
            zlo_blk = PL[4][pl.ds(r, XT), :Y]
            zhi_blk = PL[5][pl.ds(r, XT), :Y]

            def patched_y(y_row, yc):
                y_row = jnp.where(iz[0] == blo[2],
                                  zlo_blk[:, yc:yc + 1], y_row)
                return jnp.where(iz[0] == bhi[2],
                                 zhi_blk[:, yc:yc + 1], y_row)

            bs[:, blo[1], :] = patched_y(PL[2][pl.ds(r, XT), :Z], blo[1])
            bs[:, bhi[1], :] = patched_y(PL[3][pl.ds(r, XT), :Z], bhi[1])

            # x-plane splices: final writers, in the owning slab
            @pl.when(j == blo[0] // XT)
            def _():
                B[blo[0]:blo[0] + 1] = PL[0][:Y, :Z][None]

            @pl.when(j == bhi[0] // XT)
            def _():
                B[bhi[0]:bhi[0] + 1] = PL[1][:Y, :Z][None]

            # slab-wise inner-plane extraction of the NEW field (next
            # sub-step's INS) — after every splice wrote its rows
            blk = B[pl.ds(r, XT)]
            INS[2][pl.ds(r, XT), :Z] = blk[:, ilo[1], :]
            INS[3][pl.ds(r, XT), :Z] = blk[:, ihi[1], :]
            INS[4][pl.ds(r, XT), :Y] = blk[:, :, ilo[2]]
            INS[5][pl.ds(r, XT), :Y] = blk[:, :, ihi[2]]

            @pl.when(j == ilo[0] // XT)
            def _():
                INS[0][:Y, :Z] = blk[ilo[0] % XT]

            @pl.when(j == ihi[0] // XT)
            def _():
                INS[1][:Y, :Z] = blk[ihi[0] % XT]
            return 0

        jax.lax.fori_loop(0, nb, slab, 0)
        if res_cp is not None:
            res_cp.wait()
        return bad

    # -- kernel body -----------------------------------------------------
    def kernel(self, sig_ref, fb_ref, fa_ref,
               cur_hbm, prev_hbm, st_hbm, pln_hbm, *rest):
        if self.grad:
            (cur_out, prev_out, st_out, pln_out, taps_out, bad_out,
             res_hbm, A, B, STS, *planes, res_stage, sems) = rest
        else:
            (cur_out, prev_out, st_out, pln_out, taps_out, bad_out,
             A, B, STS, *planes, sems) = rest
            res_hbm = res_stage = None
        PL, INS, PRVP = (tuple(planes[0:6]), tuple(planes[6:12]),
                         tuple(planes[12:18]))

        def pln_copies(to_scratch):
            cs = []
            for role, refs in ((0, PL), (1, INS), (2, PRVP)):
                for pi in range(6):
                    hb = (pln_hbm if to_scratch else pln_out).at[role, pi]
                    pair = (hb, refs[pi]) if to_scratch else (refs[pi], hb)
                    cs.append(pltpu.make_async_copy(
                        pair[0], pair[1], sems.at[4 + role * 6 + pi]))
            return cs

        copies = [
            pltpu.make_async_copy(cur_hbm, A, sems.at[0]),
            pltpu.make_async_copy(prev_hbm, B, sems.at[1]),
            pltpu.make_async_copy(st_hbm, STS, sems.at[2]),
        ] + pln_copies(True)
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        def two(i, bad):
            t0 = 2 * i
            bad = bad + self._substep(A, B, STS, PL, INS, PRVP, fb_ref,
                                      fa_ref, sig_ref[t0], taps_out, t0,
                                      res_hbm, res_stage, sems)
            bad = bad + self._substep(B, A, STS, PL, INS, PRVP, fb_ref,
                                      fa_ref, sig_ref[t0 + 1], taps_out,
                                      t0 + 1, res_hbm, res_stage, sems)
            return bad

        bad = jax.lax.fori_loop(0, self.K // 2, two, jnp.float32(0.0))
        bad_out[0, 0] = bad

        copies = [
            pltpu.make_async_copy(A, cur_out, sems.at[0]),
            pltpu.make_async_copy(B, prev_out, sems.at[1]),
            pltpu.make_async_copy(STS, st_out, sems.at[2]),
        ] + pln_copies(False)
        for c in copies:
            c.start()
        for c in copies:
            c.wait()


# ---------------------------------------------------------------------------
# backward kernel: the adjoint leapfrog

class _MegaBwdKernel:
    """Chunk adjoint of _MegaKernel (reverse sub-step order).

    Adjoint derivation: with F_{t+1} = S(F_t, F_{t−1}, P(F_t, F_{t−1},
    st_t; θ)) and S the masked stencil + splice, the cotangent recursion
    mirrors the forward leapfrog: carrying (P̂ = ĝF̃_{t+1}, Q̂ = partial
    ĝF_t), each reverse sub-step does

      Q̂ += λ²·Σ₆shift(M ⊙ P̂)            (stencil transpose, slab loop)
      ĝpplus  = plane-coord extraction of P̂ under splice precedence
      stream (ĝpplus, ĝst') to HBM       (for the XLA θ-gradient phase)
      (ĝpl, ĝin, ĝprev, ĝst) = vjp(plane_step_one)(ĝpplus, ĝst') per plane
      Q̂[plane/inner coords] += ĝpl/ĝin;  Q̂[taps] += ĝtaps_t
      P̂ ← −(M ⊙ P̂);  P̂[plane coords] += ĝprev
      ĝsig_t = Q̂[src];  if hard: Q̂[src] ← 0;  swap(P̂, Q̂)

    ``plane_step_one`` is LINEAR in every pressure/state input, so the
    in-kernel pullbacks run at ZERO primals — the kernel needs NO
    forward residuals at all (round 5; this removed the 5.25 MB RSTG
    staging plus the θ-product temps that overflowed VMEM at 224³).
    The θ gradients (which DO need the residuals) are recovered OUTSIDE
    the kernel by differentiating the inner product
    ⟨(ĝpplus, ĝst'), plane_step_natural(residuals; θ)⟩ at the XLA level
    against the residual stream the grad-mode forward already wrote —
    exact by the vjp identity gθ = ∂θ⟨ĝ, f(x₀, θ)⟩.
    """

    def __init__(self, spec: BoxSpec, K: int, k: int, order: int,
                 src, taps):
        self.spec, self.K, self.k, self.order = spec, K, k, order
        self.src = tuple(int(v) for v in src)
        self.taps = tuple(tuple(int(v) for v in t) for t in taps)
        self.Umax, self.Vmax = stacked_plane_shape(spec)

    def _substep(self, P, Q, GSTS, GP, GPL, GIN, M0G, fbv, fav, gtaps,
                 gsig_out, t, gp_stream, gstin_stream, sems):
        spec = self.spec
        X, Y, Z = spec.dims
        nb = X // XT
        ilo, ihi = spec.ilo, spec.ihi
        blo = tuple(v - 1 for v in ilo)
        bhi = tuple(v + 1 for v in ihi)

        iy = _iota((1, Y, 1), 1)
        iz = _iota((1, 1, Z), 2)
        yz_m = ((iy >= ilo[1]) & (iy <= ihi[1]) &
                (iz >= ilo[2]) & (iz <= ihi[2]))

        # the ĝst' stream (GSTS is untouched until the pullback loop)
        # starts NOW so the DMA overlaps the whole stencil-transpose pass
        gst_cp = pltpu.make_async_copy(GSTS, gstin_stream.at[t],
                                       sems.at[3])
        gst_cp.start()

        # 1. stencil transpose: Q += λ²·Σ shift(M·P), slab by slab; the
        # same pass extracts the boundary-plane cotangents ĝpplus from
        # the RAW P̂ rows into per-plane scratch (GP) under the splice-
        # precedence kill masks — whole-array plane slices are the
        # Mosaic cliff (MEGA_NOTES.md), 8-row slab extractions are fast
        def masked_rows(r, n):
            gxr = r + _iota((n, 1, 1), 0)
            m = (gxr >= ilo[0]) & (gxr <= ihi[0]) & yz_m
            return jnp.where(m, P[pl.ds(r, n)], 0.0)

        lz2 = _iota((1, Z), 1)
        keep_yz2 = (lz2 != blo[2]) & (lz2 != bhi[2])

        def slab(j, _):
            r = pl.multiple_of(j * XT, XT)
            raw = P[pl.ds(r, XT)]
            gxr = r + _iota((XT, 1, 1), 0)
            m = (gxr >= ilo[0]) & (gxr <= ihi[0]) & yz_m
            c = jnp.where(m, raw, 0.0)
            up_row = jnp.where(j == 0, jnp.zeros((1, Y, Z), c.dtype),
                               masked_rows(jnp.maximum(r - 1, 0), 1))
            dn_row = jnp.where(j == nb - 1, jnp.zeros((1, Y, Z), c.dtype),
                               masked_rows(jnp.minimum(r + XT, X - 1), 1))
            acc = jnp.concatenate([up_row, c[:-1]], axis=0) \
                + jnp.concatenate([c[1:], dn_row], axis=0)
            zy = jnp.zeros_like(c[:, :1])
            acc = acc + jnp.concatenate([zy, c[:, :-1]], axis=1)
            acc = acc + jnp.concatenate([c[:, 1:], zy], axis=1)
            zz = jnp.zeros_like(c[:, :, :1])
            acc = acc + jnp.concatenate([zz, c[:, :, :-1]], axis=2)
            acc = acc + jnp.concatenate([c[:, :, 1:], zz], axis=2)
            Qs = Q.at[pl.ds(r, XT)]
            Qs[...] = Q[pl.ds(r, XT)] + COURANT_SQ * acc

            # ĝpplus extraction (x rows at blo/bhi excluded for y/z
            # planes; z-edge lanes excluded for y planes)
            kx = (gxr[:, :, 0] != blo[0]) & (gxr[:, :, 0] != bhi[0])
            GP[2][pl.ds(r, XT), :Z] = jnp.where(
                kx & keep_yz2, raw[:, blo[1], :], 0.0)
            GP[3][pl.ds(r, XT), :Z] = jnp.where(
                kx & keep_yz2, raw[:, bhi[1], :], 0.0)
            GP[4][pl.ds(r, XT), :Y] = jnp.where(kx, raw[:, :, blo[2]],
                                                0.0)
            GP[5][pl.ds(r, XT), :Y] = jnp.where(kx, raw[:, :, bhi[2]],
                                                0.0)

            @pl.when(j == blo[0] // XT)
            def _():
                GP[0][:Y, :Z] = raw[blo[0] % XT]

            @pl.when(j == bhi[0] // XT)
            def _():
                GP[1][:Y, :Z] = raw[bhi[0] % XT]
            return 0

        jax.lax.fori_loop(0, nb, slab, 0)

        # 2. stream this sub-step's remaining output cotangents (ĝpplus
        # in GP) to HBM for the θ-gradient phase, BEFORE the pullback
        # loop overwrites them; join the ĝst' stream started above the
        # stencil-transpose pass
        copies = [pltpu.make_async_copy(
            GP[pi], gp_stream.at[t, pi], sems.at[4 + pi])
            for pi in range(6)]
        for c in copies:
            c.start()
        gst_cp.wait()
        for c in copies:
            c.wait()

        # 3-4. plane-step VJP, ONE PLANE AT A TIME, at ZERO primals —
        # plane_step_one is linear in all pressures/state, so the
        # pressure/state cotangents are primal-independent and the
        # kernel needs no forward residuals (the r4 whole-six-plane
        # jax.vjp at true residuals kept ~17 MB of θ-product temps +
        # 5.25 MB residual staging live — the 224³ VMEM overflow; the
        # θ grads are recovered outside, see class docstring).  Staging:
        # ĝpl→GPL, ĝin→GIN; ĝprev overwrites GP in place (each GP[pi]
        # is dead once its own pullback consumed it); the ĝm₀
        # cross-plane accumulation goes through M0G and lands in GSTS
        # slot 0 after the loop (in-place would clobber gst_in[q] still
        # unread), while the higher slots (a pure shift + nothing else
        # reads them) write straight back per plane.  The scatter pass
        # below reads staged refs at dynamic slab rows (dynamic_slice
        # of VALUES is not lowerable in Mosaic; dynamic ref rows are).
        shp = [spec.plane_shape(pi) for pi in range(6)]
        zero6 = tuple(jnp.zeros((U, V), jnp.float32) for U, V in shp)
        for pi in range(6):
            U, V = shp[pi]
            M0G[pi][:U, :V] = jnp.zeros((U, V), jnp.float32)
        for pi in range(6):
            U, V = shp[pi]
            gp_pi = GP[pi][:U, :V]
            gst_in_pi = jnp.stack([GSTS[j, pi, :U, :V]
                                   for j in range(self.order)])
            _, pullback = jax.vjp(
                functools.partial(plane_step_one, spec, pi),
                zero6[pi], zero6[pi], zero6[pi], zero6,
                jnp.zeros((self.order - 1, U, V), jnp.float32),
                fbv, fav)
            (gpl_pi, gin_pi, gprev_pi, gm0c, ghi, _,
             _) = pullback((gp_pi, gst_in_pi))
            GPL[pi][:U, :V] = gpl_pi
            GIN[pi][:U, :V] = gin_pi
            GP[pi][:U, :V] = gprev_pi
            for j in range(self.order - 1):
                GSTS[j + 1, pi, :U, :V] = ghi[j]
            for q in range(6):
                Uq, Vq = shp[q]
                M0G[q][:Uq, :Vq] = M0G[q][:Uq, :Vq] + gm0c[q]
        for pi in range(6):
            U, V = shp[pi]
            GSTS[0, pi, :U, :V] = M0G[pi][:U, :V]

        # 5. fused pass: P̂ ← −(M ⊙ P̂) + ĝprev at plane rows;
        # Q̂ += ĝpl/ĝin at plane/inner rows — all slab-wise.  The z-lane
        # additions fold into ONE read-modify-write per field (the r4
        # chain of per-plane jnp.where passes re-read/rewrote each slab
        # 4×; shared edge lines still accumulate because the adds are
        # independent lane selects summed BEFORE the single store).
        # Lane-broadcasting an (XT, Y) block over Z pays a fixed
        # lane→sublane relayout of the block — the dominant scatter cost
        # (~144 µs/sub-step at 224³ across the six z-arrays; measured by
        # a scalar-substitution bisect).  The half-width split below
        # keeps the VPU temps smaller but does NOT remove the relayout
        # (measured neutral); it is kept because the relayout fix — a
        # z-plane-transposed staging layout or an MXU outer-product
        # splice — is future work (MEGA_NOTES.md round-5 notes).
        zsplit = (Z % 128 == 0 and Z >= 256
                  and blo[2] < 128 and ilo[2] < 128
                  and bhi[2] >= Z - 128 and ihi[2] >= Z - 128)

        def scatter(j, _):
            r = pl.multiple_of(j * XT, XT)
            lz3 = _iota((1, 1, Z), 2)
            negp = -masked_rows(r, XT)
            qblk = Q[pl.ds(r, XT)]
            if zsplit:
                lzl = _iota((1, 1, 128), 2)
                lzh = (Z - 128) + lzl
                p_lo = jnp.where(
                    lzl == blo[2],
                    GP[4][pl.ds(r, XT), :Y][:, :, None], 0.0)
                p_hi = jnp.where(
                    lzh == bhi[2],
                    GP[5][pl.ds(r, XT), :Y][:, :, None], 0.0)
                mids = ([jnp.zeros((XT, Y, Z - 256), p_lo.dtype)]
                        if Z > 256 else [])
                padd = jnp.concatenate([p_lo] + mids + [p_hi], axis=2)
                q_lo = jnp.where(
                    lzl == blo[2],
                    GPL[4][pl.ds(r, XT), :Y][:, :, None], 0.0)
                q_lo = q_lo + jnp.where(
                    lzl == ilo[2],
                    GIN[4][pl.ds(r, XT), :Y][:, :, None], 0.0)
                q_hi = jnp.where(
                    lzh == bhi[2],
                    GPL[5][pl.ds(r, XT), :Y][:, :, None], 0.0)
                q_hi = q_hi + jnp.where(
                    lzh == ihi[2],
                    GIN[5][pl.ds(r, XT), :Y][:, :, None], 0.0)
                qadd = jnp.concatenate([q_lo] + mids + [q_hi], axis=2)
            else:
                padd = jnp.where(
                    lz3 == blo[2],
                    GP[4][pl.ds(r, XT), :Y][:, :, None], 0.0)
                padd = padd + jnp.where(
                    lz3 == bhi[2],
                    GP[5][pl.ds(r, XT), :Y][:, :, None], 0.0)
                qadd = jnp.where(
                    lz3 == blo[2],
                    GPL[4][pl.ds(r, XT), :Y][:, :, None], 0.0)
                qadd = qadd + jnp.where(
                    lz3 == bhi[2],
                    GPL[5][pl.ds(r, XT), :Y][:, :, None], 0.0)
                qadd = qadd + jnp.where(
                    lz3 == ilo[2],
                    GIN[4][pl.ds(r, XT), :Y][:, :, None], 0.0)
                qadd = qadd + jnp.where(
                    lz3 == ihi[2],
                    GIN[5][pl.ds(r, XT), :Y][:, :, None], 0.0)
            Ps = P.at[pl.ds(r, XT)]
            Ps[...] = negp + padd
            # ĝprev lands at boundary-plane coords (−M·P̂ is zero there;
            # shared edge lines accumulate across the plane loop)
            Ps[:, blo[1], :] = P[pl.ds(r, XT), blo[1], :] \
                + GP[2][pl.ds(r, XT), :Z]
            Ps[:, bhi[1], :] = P[pl.ds(r, XT), bhi[1], :] \
                + GP[3][pl.ds(r, XT), :Z]

            # Q̂ scatters: boundary (gpl) + inner (gin) y/z planes
            Qs = Q.at[pl.ds(r, XT)]
            Qs[...] = qblk + qadd
            Qs[:, blo[1], :] = Q[pl.ds(r, XT), blo[1], :] \
                + GPL[2][pl.ds(r, XT), :Z]
            Qs[:, bhi[1], :] = Q[pl.ds(r, XT), bhi[1], :] \
                + GPL[3][pl.ds(r, XT), :Z]
            Qs[:, ilo[1], :] = Q[pl.ds(r, XT), ilo[1], :] \
                + GIN[2][pl.ds(r, XT), :Z]
            Qs[:, ihi[1], :] = Q[pl.ds(r, XT), ihi[1], :] \
                + GIN[3][pl.ds(r, XT), :Z]
            return 0

        jax.lax.fori_loop(0, nb, scatter, 0)
        # x planes: static global rows
        P[blo[0]:blo[0] + 1] = P[blo[0]:blo[0] + 1] \
            + GP[0][:Y, :Z][None]
        P[bhi[0]:bhi[0] + 1] = P[bhi[0]:bhi[0] + 1] \
            + GP[1][:Y, :Z][None]
        Q[blo[0]:blo[0] + 1] = Q[blo[0]:blo[0] + 1] \
            + GPL[0][:Y, :Z][None]
        Q[bhi[0]:bhi[0] + 1] = Q[bhi[0]:bhi[0] + 1] \
            + GPL[1][:Y, :Z][None]
        Q[ilo[0]:ilo[0] + 1] = Q[ilo[0]:ilo[0] + 1] \
            + GIN[0][:Y, :Z][None]
        Q[ihi[0]:ihi[0] + 1] = Q[ihi[0]:ihi[0] + 1] \
            + GIN[1][:Y, :Z][None]

        # 6. receiver-tap cotangents into Q̂ (static rows)
        lane = _iota((1, 1, Z), 2)
        for j, (tx, ty, tz) in enumerate(self.taps):
            trow = Q[tx:tx + 1, ty:ty + 1, :]
            Q[tx:tx + 1, ty:ty + 1, :] = \
                trow + jnp.where(lane == tz, gtaps[t, j], 0.0)

        # 7. source-signal cotangent; hard source blocks flow through F̃
        sx, sy, sz, mode = self.src
        srow = Q[sx:sx + 1, sy:sy + 1, :]
        gsig = jnp.sum(jnp.where(lane == sz, srow, 0.0)) * \
            (1.0 if mode > 0 else 0.0)
        gsig_out[pl.ds(t, 1), :] = gsig[None, None]
        if mode == 1:
            Q[sx:sx + 1, sy:sy + 1, :] = jnp.where(lane == sz, 0.0, srow)
        return 0

    def kernel(self, fb_ref, fa_ref,
               gtaps_ref, gnext_hbm, gcur_hbm, gst_hbm,
               gnext_out, gcur_out, gst_out, gsig_out, gp_stream,
               gstin_stream, P, Q, GSTS, *rest):
        planes = rest[:-1]
        sems = rest[-1]
        GP, GPL, GIN, M0G = (tuple(planes[0:6]), tuple(planes[6:12]),
                             tuple(planes[12:18]), tuple(planes[18:24]))
        copies = [
            pltpu.make_async_copy(gnext_hbm, P, sems.at[0]),
            pltpu.make_async_copy(gcur_hbm, Q, sems.at[1]),
            pltpu.make_async_copy(gst_hbm, GSTS, sems.at[2]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        fbv, fav = fb_ref[...], fa_ref[...]

        def two(i, z):
            t1 = self.K - 1 - 2 * i
            z = self._substep(P, Q, GSTS, GP, GPL, GIN, M0G, fbv, fav,
                              gtaps_ref, gsig_out, t1, gp_stream,
                              gstin_stream, sems)
            z = self._substep(Q, P, GSTS, GP, GPL, GIN, M0G, fbv, fav,
                              gtaps_ref, gsig_out, t1 - 1, gp_stream,
                              gstin_stream, sems)
            return z

        jax.lax.fori_loop(0, self.K // 2, two, 0)

        copies = [
            pltpu.make_async_copy(P, gnext_out, sems.at[0]),
            pltpu.make_async_copy(Q, gcur_out, sems.at[1]),
            pltpu.make_async_copy(GSTS, gst_out, sems.at[2]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()


# ---------------------------------------------------------------------------
# pallas_call builders

def _f32(*shape):
    return jax.ShapeDtypeStruct(shape, jnp.float32)


def _build_call(spec: BoxSpec, K: int, k: int, order: int, src, taps,
                grad: bool = False, interpret: bool = False):
    mk = _MegaKernel(spec, K, k, order, src, taps, grad=grad)
    X, Y, Z = spec.dims
    Umax, Vmax = mk.Umax, mk.Vmax
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)      # noqa: E731
    anym = lambda: pl.BlockSpec(memory_space=pltpu.ANY)       # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)      # noqa: E731
    out_shape = [_f32(X, Y, Z), _f32(X, Y, Z),
                 _f32(order, 6, Umax, Vmax), _f32(3, 6, Umax, Vmax),
                 _f32(K, k), _f32(1, 1)]
    out_specs = [anym(), anym(), anym(), anym(), vmem(), smem()]
    scratch = [
        pltpu.VMEM((X, Y, Z), jnp.float32),
        pltpu.VMEM((X, Y, Z), jnp.float32),
        pltpu.VMEM((order, 6, Umax, Vmax), jnp.float32),
    ]
    # carried per-plane 2-D scratch: PL, INS, PRVP x 6, PADDED to the
    # uniform (Umax, Vmax) (DMA slices must be lane-aligned; the math
    # reads/writes the [:U, :V] region, the padding stays zero)
    for _role in range(3):
        for pi in range(6):
            scratch.append(pltpu.VMEM((Umax, Vmax), jnp.float32))
    if grad:
        out_shape.append(_f32(K, 4, 6, Umax, Vmax))
        out_specs.append(anym())
        scratch.append(pltpu.VMEM((4, 6, Umax, Vmax), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((22,)))
    return pl.pallas_call(
        mk.kernel,
        in_specs=[smem(), vmem(), vmem(),
                  anym(), anym(), anym(), anym()],
        out_shape=tuple(out_shape),
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )


def _build_bwd_call(spec: BoxSpec, K: int, k: int, order: int, src,
                    taps, interpret: bool = False):
    mk = _MegaBwdKernel(spec, K, k, order, src, taps)
    X, Y, Z = spec.dims
    Umax, Vmax = mk.Umax, mk.Vmax
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)      # noqa: E731
    anym = lambda: pl.BlockSpec(memory_space=pltpu.ANY)       # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)      # noqa: E731
    return pl.pallas_call(
        mk.kernel,
        in_specs=[vmem(), vmem(), vmem(),
                  anym(), anym(), anym()],
        out_shape=(
            _f32(X, Y, Z), _f32(X, Y, Z),
            _f32(order, 6, Umax, Vmax), _f32(K, 1),
            _f32(K, 6, Umax, Vmax),
            _f32(K, order, 6, Umax, Vmax),
        ),
        out_specs=(anym(), anym(), anym(), vmem(), anym(), anym()),
        scratch_shapes=[
            pltpu.VMEM((X, Y, Z), jnp.float32),
            pltpu.VMEM((X, Y, Z), jnp.float32),
            pltpu.VMEM((order, 6, Umax, Vmax), jnp.float32),
        ] + [pltpu.VMEM((Umax, Vmax), jnp.float32)
             for _ in range(24)] + [
            pltpu.SemaphoreType.DMA((10,)),
        ],
        input_output_aliases={3: 0, 4: 1, 5: 2},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# capacity / eligibility

def mega_vmem_bytes(spec: BoxSpec, order: int) -> int:
    X, Y, Z = spec.dims
    Umax, Vmax = stacked_plane_shape(spec)
    return 4 * (2 * X * Y * Z + (order + 4) * 6 * Umax * Vmax)


def mega_supported(spec: Optional[BoxSpec], source, receiver,
                   dtype=jnp.float32, state_dtype=None,
                   filter_order: int = 6) -> bool:
    """Mega-path eligibility: TPU backend, f32 field+state, a kernel-
    injectable point source, a replayable receiver, tile-aligned dims and
    the VMEM capacity bound (checked at the ACTUAL filter order so the
    capacity test matches the kernel that would be built)."""
    if spec is None or jax.default_backend() not in ("tpu", "axon"):
        return False
    if dtype not in (jnp.float32, np.float32):
        return False
    if state_dtype is not None and state_dtype not in (jnp.float32,
                                                       np.float32):
        return False
    if not hasattr(source, "kernel_injection"):
        return False
    if not hasattr(receiver, "tap_nodes"):
        return False
    X, Y, Z = spec.dims
    if X % XT or Y % 8 or Z % 128:
        return False
    return mega_vmem_bytes(spec, filter_order) <= VMEM_BUDGET


# ---------------------------------------------------------------------------
# tap replay

class _SeqTapView:
    """Sequential flat-field stand-in for replaying receiver.tap over a
    (k,) row of kernel-extracted pressures.

    Receivers read the field with one or more ``field[idx]`` gathers whose
    index arrays, concatenated in read order, equal ``tap_nodes()``; each
    ``__getitem__`` hands out the next segment of the row.
    """

    def __init__(self, row):
        self._row = row
        self._pos = 0

    def __getitem__(self, idx):
        n = int(np.prod(np.shape(idx))) if np.ndim(idx) else 1
        seg = self._row[self._pos:self._pos + n]
        self._pos += n
        return seg.reshape(np.shape(idx))


def replay_taps(receiver, taps, dtype=jnp.float32):
    """Run the receiver's per-step arithmetic over the (T, k) kernel tap
    series; returns stacked per-step outputs (same pytree as the scan in
    run.run_waveguide_box)."""

    def body(state, row):
        state, out = receiver.tap(_SeqTapView(row), state)
        return state, out

    _, outputs = jax.lax.scan(body, receiver.init_state(dtype), taps)
    return outputs


# ---------------------------------------------------------------------------
# chunked runner with custom VJP

@functools.lru_cache(maxsize=16)
def _diff_core(spec: BoxSpec, chunk: int, k: int, order: int,
               nchunks: int, src, taps, interpret: bool):
    """(taps, stable) = core(face_b, face_a, sig) with a chunk-level
    custom VJP (gradients w.r.t. face_b/face_a/sig).  ``src``/``taps``:
    static source (x, y, z, mode) / receiver tap coordinates."""
    fcall = _build_call(spec, chunk, k, order, src, taps,
                        interpret=interpret)
    gcall = _build_call(spec, chunk, k, order, src, taps, grad=True,
                        interpret=interpret)
    bcall = _build_bwd_call(spec, chunk, k, order, src, taps,
                            interpret=interpret)
    dims = spec.dims
    Umax, Vmax = stacked_plane_shape(spec)

    def init_state():
        return (jnp.zeros(dims, jnp.float32), jnp.zeros(dims, jnp.float32),
                jnp.zeros((order, 6, Umax, Vmax), jnp.float32),
                jnp.zeros((3, 6, Umax, Vmax), jnp.float32))

    @jax.custom_vjp
    def core(face_b, face_a, sig):
        def body(carry, c):
            cur, prev, st, pln, bad = carry
            s = jax.lax.dynamic_slice_in_dim(sig, c * chunk, chunk)
            cur, prev, st, pln, taps, b = fcall(s, face_b, face_a, cur,
                                                prev, st, pln)
            return (cur, prev, st, pln, bad + b[0, 0]), taps

        (cur, prev, st, pln, bad), taps = jax.lax.scan(
            body, (*init_state(), jnp.float32(0.0)), jnp.arange(nchunks))
        stable = (bad == 0.0) & jnp.all(jnp.isfinite(cur))
        return taps, stable

    def core_fwd(face_b, face_a, sig):
        def body(carry, c):
            cur, prev, st, pln, bad = carry
            s = jax.lax.dynamic_slice_in_dim(sig, c * chunk, chunk)
            cur, prev, st, pln, taps, b, res = gcall(s, face_b, face_a,
                                                     cur, prev, st, pln)
            return (cur, prev, st, pln, bad + b[0, 0]), (taps, res)

        (cur, prev, st, pln, bad), (taps, res) = jax.lax.scan(
            body, (*init_state(), jnp.float32(0.0)), jnp.arange(nchunks))
        stable = (bad == 0.0) & jnp.all(jnp.isfinite(cur))
        return (taps, stable), (face_b, face_a, res)

    def _chunk_theta_grads(face_b, face_a, res_c, gp_s, gstin_s):
        """θ cotangents for one chunk, OUTSIDE the kernel: differentiate
        the inner product ⟨(ĝpplus, ĝst'), plane_step_natural(res; θ)⟩
        (exact: gθ = ∂θ⟨ĝ, f(x₀, θ)⟩; the kernel's own pullbacks run at
        zero primals and carry no θ information — class docstring)."""
        shp = [spec.plane_shape(p) for p in range(6)]

        def theta_ip(fb_, fa_):
            def step_ip(res_t, gp_t, gstin_t):
                pl6 = tuple(res_t[0, pi, :U, :V]
                            for pi, (U, V) in enumerate(shp))
                in6 = tuple(res_t[1, pi, :U, :V]
                            for pi, (U, V) in enumerate(shp))
                prev6 = tuple(res_t[2, pi, :U, :V]
                              for pi, (U, V) in enumerate(shp))
                st6 = tuple(jnp.concatenate(
                    [res_t[3, pi, :U, :V][None],
                     jnp.zeros((order - 1, U, V), jnp.float32)], axis=0)
                    for pi, (U, V) in enumerate(shp))
                pp, ns = plane_step_natural(spec, pl6, in6, prev6, st6,
                                            fb_, fa_, kernel=False)
                acc = jnp.float32(0.0)
                for pi, (U, V) in enumerate(shp):
                    acc = acc + jnp.vdot(gp_t[pi, :U, :V], pp[pi])
                    acc = acc + jnp.vdot(gstin_t[:, pi, :U, :V], ns[pi])
                return acc

            return jnp.sum(jax.vmap(step_ip)(res_c, gp_s, gstin_s))

        return jax.grad(theta_ip, argnums=(0, 1))(face_b, face_a)

    def core_bwd(saved, ct):
        face_b, face_a, res = saved
        gtaps, _ = ct

        def body(carry, c):
            gnext, gcur, gst, gfb, gfa = carry
            gnext, gcur, gst, gsig_c, gp_s, gstin_s = bcall(
                face_b, face_a, gtaps[c], gnext, gcur, gst)
            gfb_c, gfa_c = _chunk_theta_grads(face_b, face_a, res[c],
                                              gp_s, gstin_s)
            return (gnext, gcur, gst, gfb + gfb_c, gfa + gfa_c), \
                gsig_c[:, 0]

        z66 = jnp.zeros((6, order + 1), jnp.float32)
        zf = jnp.zeros(dims, jnp.float32)
        zst = jnp.zeros((order, 6, Umax, Vmax), jnp.float32)
        (gnext, gcur, gst, gfb, gfa), gsig = jax.lax.scan(
            body, (zf, zf, zst, z66, z66),
            jnp.arange(nchunks - 1, -1, -1))
        # gsig rows come out chunk-reversed; restore time order
        gsig = jnp.flip(gsig, axis=0).reshape(nchunks * chunk)
        return (gfb, gfa, gsig)

    core.defvjp(core_fwd, core_bwd)
    return core


@functools.lru_cache(maxsize=16)
def _jitted_runner(spec: BoxSpec, chunk: int, k: int, order: int,
                   nchunks: int, num_steps: int, src, taps_c,
                   interpret: bool):
    core = _diff_core(spec, chunk, k, order, nchunks, src, taps_c,
                      interpret)

    @jax.jit
    def run(sig, face_b, face_a, receiver):
        taps, stable = core(face_b, face_a, sig)
        taps = taps.reshape(nchunks * chunk, k)[:num_steps]
        outputs = replay_taps(receiver, taps)
        return outputs, stable

    return run


def run_waveguide_box_mega(structure, spec: BoxSpec, source, receiver,
                           num_steps: int, chunk: int = 128,
                           dtype=jnp.float32, interpret: bool = False
                           ) -> dict:
    """Mega-path twin of run.run_waveguide_box (same outputs contract).

    ``chunk``: sub-steps per pallas_call (even; HBM traffic ~4 fields per
    chunk — K=128 swept best on v5e at 224³, r5: fewer host dispatches
    and chunk-boundary swaps than 64, flat beyond).  Trailing steps are
    padded with zero signal; padded taps are discarded (the
    post-``num_steps`` field state is not part of the outputs contract
    beyond the stability check).

    Host-side bookkeeping (receiver tap coordinates) requires CONCRETE
    source/receiver index arrays — call outside jit; the hot loop inside
    is jitted and cached per (spec, chunk, k, order, nchunks).
    """
    dims = spec.dims
    order = structure.filter_order
    face_idx = np.asarray(spec.face_surface, dtype=np.int32)
    face_b = jnp.asarray(structure.coef_b)[face_idx].astype(jnp.float32)
    face_a = jnp.asarray(structure.coef_a)[face_idx].astype(jnp.float32)

    src = tuple(int(v) for v in np.asarray(jax.device_get(
        source.kernel_injection(dims, 0)[0])))       # (x, y, z, mode)
    nchunks = -(-num_steps // chunk)
    T = nchunks * chunk
    sig = jnp.zeros((T,), jnp.float32).at[:num_steps].set(
        jnp.asarray(source.signal, jnp.float32)[:num_steps])

    tap_nodes = np.asarray(jax.device_get(receiver.tap_nodes())).reshape(-1)
    k = int(tap_nodes.size)
    taps_c = tuple(tuple(int(v) for v in row) for row in np.stack(
        np.unravel_index(tap_nodes, dims), axis=-1))

    run = _jitted_runner(spec, chunk, k, order, nchunks, num_steps,
                         src, taps_c, interpret)
    outputs, stable = run(sig, face_b, face_a, receiver)
    return {"outputs": outputs, "stable": stable}


def mega_canonical_loss_fn(structure, spec, source, receiver, num_steps,
                           chunk: int = 128, interpret: bool = False):
    """Differentiable (coef_b, coef_a, signal) → (taps, stable) closure on
    the mega path, for gradient-based workflows and the bench backward.

    Returns ``f(face_b, face_a, sig)`` plus the static tap metadata; the
    caller builds its loss on the (num_steps, k) tap block (e.g. replay a
    receiver over it) and differentiates straight through the chunk-level
    custom VJP."""
    dims = spec.dims
    order = structure.filter_order
    src = tuple(int(v) for v in np.asarray(jax.device_get(
        source.kernel_injection(dims, 0)[0])))
    nchunks = -(-num_steps // chunk)
    tap_nodes = np.asarray(jax.device_get(receiver.tap_nodes())).reshape(-1)
    k = int(tap_nodes.size)
    taps_c = tuple(tuple(int(v) for v in row) for row in np.stack(
        np.unravel_index(tap_nodes, dims), axis=-1))
    core = _diff_core(spec, chunk, k, order, nchunks, src, taps_c,
                      interpret)

    def f(face_b, face_a, sig):
        T = nchunks * chunk
        sigp = jnp.zeros((T,), jnp.float32).at[:num_steps].set(
            sig[:num_steps].astype(jnp.float32))
        taps, stable = core(face_b, face_a, sigp)
        return taps.reshape(T, k)[:num_steps], stable

    return f
