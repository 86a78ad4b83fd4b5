"""Pallas TPU kernel for the interior FDTD update.

The jnp formulation (six padded shifts) compiles pathologically on the TPU
backend (~10 min for one scan) and runs at a few percent of HBM bandwidth.
This kernel tiles the grid into x-slabs; each grid step streams its slab of
``current`` (plus one-plane halos from the neighbouring slabs), ``previous``
and the interior mask through VMEM and writes the updated slab:

    p⁺ = λ²·Σ₆ p_neighbours − p⁻   on interior nodes, 0 elsewhere.

x-halos come from passing ``current`` three times with shifted block index
maps (clamped at the edges and masked in-kernel); y/z shifts are internal to
the block (the slab spans full Y/Z), with zero fill at the walls — outside
nodes are zero anyway, so a zero edge is exact.

Shapes must be tile-aligned: X % XT == 0, Y % 8 == 0, Z % 128 == 0
(``waveguide.setup`` rounds mesh dims up; the extra nodes are outside and
inert).  Use ``interior_step_auto`` to dispatch pallas-on-TPU / jnp-on-CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wayverb_tpu.waveguide.descriptor import COURANT_SQ

XT = 8  # x-planes per tile


def _kernel(cur_lo_ref, cur_ref, cur_hi_ref, prev_ref, mask_ref, out_ref):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    c = cur_ref[...]                                   # (XT, Y, Z)

    # x neighbours: shift down/up with halo planes from adjacent blocks
    up = jnp.concatenate([cur_lo_ref[XT - 1:], c[:-1]], axis=0)
    dn = jnp.concatenate([c[1:], cur_hi_ref[:1]], axis=0)
    # first/last global slabs have no real neighbour: zero that plane
    row = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
    up = jnp.where((i == 0) & (row == 0), 0.0, up)
    dn = jnp.where((i == n - 1) & (row == XT - 1), 0.0, dn)
    acc = up + dn

    # y neighbours (zero at walls — outside nodes are zero anyway)
    zeros_y = jnp.zeros_like(c[:, :1])
    acc = acc + jnp.concatenate([zeros_y, c[:, :-1]], axis=1)
    acc = acc + jnp.concatenate([c[:, 1:], zeros_y], axis=1)

    # z neighbours
    zeros_z = jnp.zeros_like(c[:, :, :1])
    acc = acc + jnp.concatenate([zeros_z, c[:, :, :-1]], axis=2)
    acc = acc + jnp.concatenate([c[:, :, 1:], zeros_z], axis=2)

    out_ref[...] = (COURANT_SQ * acc - prev_ref[...]) * mask_ref[...]


def interior_step_pallas(current, previous, interior_mask,
                         interpret: bool = False):
    """(X, Y, Z) masked interior update via the tiled Pallas kernel."""
    X, Y, Z = current.shape
    if X % XT or Y % 8 or Z % 128:
        raise ValueError(
            f"grid {current.shape} not tile-aligned (need X%{XT}, Y%8, "
            "Z%128 == 0); build the mesh with aligned dims")
    nb = X // XT

    def tile(i):
        return (i, 0, 0)

    def tile_lo(i):
        return (jnp.maximum(i - 1, 0), 0, 0)

    def tile_hi(i):
        return (jnp.minimum(i + 1, nb - 1), 0, 0)

    spec = lambda im: pl.BlockSpec((XT, Y, Z), im,      # noqa: E731
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[spec(tile_lo), spec(tile), spec(tile_hi), spec(tile),
                  spec(tile)],
        out_specs=spec(tile),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), current.dtype),
        interpret=interpret,
    )(current, current, current, previous, interior_mask)


def interior_step_jnp(current, previous, interior_mask):
    from wayverb_tpu.waveguide.stencil import interior_step
    return interior_step(current, previous, interior_mask)


# ---------------------------------------------------------------------------
# fused general-mesh step: weighted neighbour sum driven by a packed
# per-node bitfield (MeshStructure.weight_code).  One dense pass yields the
# interior update AND every boundary node's weighted neighbour sum (csw),
# replacing the slow path's (B, 6) flat gather (VERDICT r2 #8).
#
#   out[x] = λ²·Σ_d w_d(x)·p[x+e_d] − interior(x)·p⁻[x]
#   w_d(x) = bit(d) + bit(6+d) of weight_code[x]   ∈ {0, 1, 2}
#
# Direction order d = 0..5 ↔ (−x, +x, −y, +y, −z, +z), matching
# descriptor.DIRECTION_OFFSETS and the shift order of ``_kernel`` above.

_OPPOSITE = (1, 0, 3, 2, 5, 4)


def _shifts_in_kernel(c, lo_ref, hi_ref, i, n):
    """The six neighbour views p[x+e_d] of a (XT, Y, Z) block, with x-halos
    from the adjacent blocks and zero fill at global walls."""
    row = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
    up = jnp.concatenate([lo_ref[XT - 1:], c[:-1]], axis=0)
    dn = jnp.concatenate([c[1:], hi_ref[:1]], axis=0)
    up = jnp.where((i == 0) & (row == 0), jnp.zeros_like(up), up)
    dn = jnp.where((i == n - 1) & (row == XT - 1), jnp.zeros_like(dn), dn)
    zy = jnp.zeros_like(c[:, :1])
    zz = jnp.zeros_like(c[:, :, :1])
    return (up, dn,
            jnp.concatenate([zy, c[:, :-1]], axis=1),
            jnp.concatenate([c[:, 1:], zy], axis=1),
            jnp.concatenate([zz, c[:, :, :-1]], axis=2),
            jnp.concatenate([c[:, :, 1:], zz], axis=2))


def _weight(W, d):
    return (((W >> d) & 1) + ((W >> (6 + d)) & 1)).astype(jnp.float32)


def _shifts_in_kernel(c, lo_ref, hi_ref, i, n):
    """The six neighbour views p[x+e_d] of a (XT, Y, Z) block, with x-halos
    from the adjacent blocks and zero fill at global walls (the lo/c/hi
    triple-stream form — kept for the sharded haloed kernels)."""
    row = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
    up = jnp.concatenate([lo_ref[XT - 1:], c[:-1]], axis=0)
    dn = jnp.concatenate([c[1:], hi_ref[:1]], axis=0)
    up = jnp.where((i == 0) & (row == 0), jnp.zeros_like(up), up)
    dn = jnp.where((i == n - 1) & (row == XT - 1), jnp.zeros_like(dn), dn)
    zy = jnp.zeros_like(c[:, :1])
    zz = jnp.zeros_like(c[:, :, :1])
    return (up, dn,
            jnp.concatenate([zy, c[:, :-1]], axis=1),
            jnp.concatenate([c[:, 1:], zy], axis=1),
            jnp.concatenate([zz, c[:, :, :-1]], axis=2),
            jnp.concatenate([c[:, :, 1:], zz], axis=2))


def _rolled_shifts(c, tail, dn_row, j, nb):
    """The six neighbour views of a (XT, Y, Z) block in the LAGGED grid:
    the x-up halo comes from the carried ``tail`` (last row of the
    previous block, zero-seeded at the first grid step = global wall),
    the x-down halo from the ARRIVING next block's first row (``dn_row``,
    zeroed at the last block = global wall).  One cur stream instead of
    the lo/c/hi triple-stream of the r3 formulation (3× HBM traffic)."""
    up = jnp.concatenate([tail, c[:-1]], axis=0)
    dn = jnp.concatenate([c[1:], dn_row], axis=0)
    zy = jnp.zeros_like(c[:, :1])
    zz = jnp.zeros_like(c[:, :, :1])
    return (up, dn,
            jnp.concatenate([zy, c[:, :-1]], axis=1),
            jnp.concatenate([c[:, 1:], zy], axis=1),
            jnp.concatenate([zz, c[:, :, :-1]], axis=2),
            jnp.concatenate([c[:, :, 1:], zz], axis=2))


def _wkernel(cur_ref, prev_ref, code_ref, out_ref, slab, tail, *, Y, Z,
             nb):
    i = pl.program_id(0)
    j = jnp.maximum(i - 1, 0)

    @pl.when(i >= 1)
    def _():
        c = slab[...]
        dn_row = jnp.where(j == nb - 1,
                           jnp.zeros((1, Y, Z), c.dtype), cur_ref[0:1])
        shifts = _rolled_shifts(c, tail[...], dn_row, j, nb)
        W = code_ref[...]
        acc = jnp.zeros_like(c)
        for d in range(6):
            acc = acc + _weight(W, d) * shifts[d]
        is_int = ((W >> 12) & 1).astype(c.dtype)
        out_ref[...] = COURANT_SQ * acc - is_int * prev_ref[...]

    tail[...] = jnp.where(i == 0, jnp.zeros_like(slab[XT - 1:XT]),
                          slab[XT - 1:XT])
    slab[...] = cur_ref[...]


def _wkernel_bwd(g_ref, w_ref, out_ref, slab_g, tail_g, slab_w, tail_w,
                 *, Y, Z, nb):
    """cur̄[y] = λ²·Σ_d w_d(y−e_d)·ḡ(y−e_d) = λ²·Σ_dd shift_dd(ḡ)·
    w_opp(dd)(shift_dd position) — the transpose of the weighted sum.
    Same lagged rolling window, carried for BOTH ḡ and the weight code."""
    i = pl.program_id(0)
    j = jnp.maximum(i - 1, 0)

    @pl.when(i >= 1)
    def _():
        g = slab_g[...]
        gdn = jnp.where(j == nb - 1, jnp.zeros((1, Y, Z), g.dtype),
                        g_ref[0:1])
        gs = _rolled_shifts(g, tail_g[...], gdn, j, nb)
        W = slab_w[...]
        wdn = jnp.where(j == nb - 1, jnp.zeros((1, Y, Z), W.dtype),
                        w_ref[0:1])
        ws = _rolled_shifts(W, tail_w[...], wdn, j, nb)
        acc = jnp.zeros_like(g)
        for dd in range(6):
            acc = acc + _weight(ws[dd], _OPPOSITE[dd]) * gs[dd]
        out_ref[...] = COURANT_SQ * acc

    tail_g[...] = jnp.where(i == 0, jnp.zeros_like(slab_g[XT - 1:XT]),
                            slab_g[XT - 1:XT])
    slab_g[...] = g_ref[...]
    tail_w[...] = jnp.where(i == 0, jnp.zeros_like(slab_w[XT - 1:XT]),
                            slab_w[XT - 1:XT])
    slab_w[...] = w_ref[...]


def _wcall(kernel, a, b_extra, X, Y, Z, dtype):
    import functools as _ft
    nb = X // XT

    def tile_arrive(i):
        return (jnp.minimum(i, nb - 1), 0, 0)

    def tile_lag(i):
        return (jnp.maximum(i - 1, 0), 0, 0)

    def spec(im, dt):
        return pl.BlockSpec((XT, Y, Z), im, memory_space=pltpu.VMEM)

    specs = []
    args = []
    scratch = []
    for arr, windowed in a:
        if windowed:
            # arriving block + (slab, tail) window scratch
            specs.append(spec(tile_arrive, arr.dtype))
            args.append(arr)
            scratch += [pltpu.VMEM((XT, Y, Z), arr.dtype),
                        pltpu.VMEM((1, Y, Z), arr.dtype)]
        else:
            specs.append(spec(tile_lag, arr.dtype))
            args.append(arr)
    return pl.pallas_call(
        _ft.partial(kernel, Y=Y, Z=Z, nb=nb),
        grid=(nb + 1,),
        in_specs=specs,
        out_specs=spec(tile_lag, dtype),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), dtype),
        scratch_shapes=scratch,
        interpret=b_extra,
    )(*args)


def weighted_step_jnp(current, previous, weight_code):
    """jnp oracle/fallback for the fused general step."""
    import numpy as np
    from wayverb_tpu.waveguide.descriptor import DIRECTION_OFFSETS

    acc = jnp.zeros_like(current)
    for d in range(6):
        off = DIRECTION_OFFSETS[d]
        ax = int(np.argmax(np.abs(np.asarray(off))))
        o = int(off[ax])
        n = current.shape[ax]
        src = [slice(None)] * 3
        pad = [(0, 0)] * 3
        if o == 1:
            src[ax] = slice(1, n)
            pad[ax] = (0, 1)
        else:
            src[ax] = slice(0, n - 1)
            pad[ax] = (1, 0)
        shifted = jnp.pad(current[tuple(src)], pad)
        w = (((weight_code >> d) & 1) +
             ((weight_code >> (6 + d)) & 1)).astype(current.dtype)
        acc = acc + w * shifted
    is_int = ((weight_code >> 12) & 1).astype(current.dtype)
    return COURANT_SQ * acc - is_int * previous


@jax.custom_vjp
def weighted_step(current, previous, weight_code):
    """Dense fused step: interior update + boundary csw in one pass."""
    if use_pallas(current.shape):
        X, Y, Z = current.shape
        return _wcall(_wkernel,
                      [(current, True), (previous, False),
                       (weight_code, False)],
                      False, X, Y, Z, current.dtype)
    return weighted_step_jnp(current, previous, weight_code)


def _weighted_fwd(current, previous, weight_code):
    return weighted_step(current, previous, weight_code), weight_code


def _weighted_bwd(weight_code, g):
    import numpy as np
    from jax.dtypes import float0
    if use_pallas(g.shape):
        X, Y, Z = g.shape
        cur_bar = _wcall(_wkernel_bwd,
                         [(g, True), (weight_code, True)],
                         False, X, Y, Z, g.dtype)
    else:
        # transpose of the jnp formulation: shift the product w_d·ḡ the
        # other way (y+e_dd reads use w_opp(dd) at the shifted site)
        from wayverb_tpu.waveguide.descriptor import DIRECTION_OFFSETS
        acc = jnp.zeros_like(g)
        for dd in range(6):
            d = _OPPOSITE[dd]
            w = (((weight_code >> d) & 1) +
                 ((weight_code >> (6 + d)) & 1)).astype(g.dtype)
            prod = w * g
            off = DIRECTION_OFFSETS[dd]
            ax = int(np.argmax(np.abs(np.asarray(off))))
            o = int(off[ax])
            n = g.shape[ax]
            src = [slice(None)] * 3
            pad = [(0, 0)] * 3
            if o == 1:
                src[ax] = slice(1, n)
                pad[ax] = (0, 1)
            else:
                src[ax] = slice(0, n - 1)
                pad[ax] = (1, 0)
            acc = acc + jnp.pad(prod[tuple(src)], pad)
        cur_bar = COURANT_SQ * acc
    is_int = ((weight_code >> 12) & 1).astype(g.dtype)
    prev_bar = -is_int * g
    return (cur_bar, prev_bar,
            np.zeros(weight_code.shape, dtype=float0))


weighted_step.defvjp(_weighted_fwd, _weighted_bwd)


def use_pallas(shape=None) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if shape is not None:
        X, Y, Z = shape
        if X % XT or Y % 8 or Z % 128:
            return False
    return True


def interior_step_auto(current, previous, interior_mask):
    if use_pallas(current.shape):
        return interior_step_pallas(current, previous, interior_mask)
    return interior_step_jnp(current, previous, interior_mask)


# ---------------------------------------------------------------------------
# sharded variant: explicit x-halo inputs for shard_map domain decomposition

def _wkernel_haloed(cur_lo_ref, cur_ref, cur_hi_ref, prev_ref, code_ref,
                    hlo_ref, hhi_ref, out_ref):
    """_wkernel with shard halo rows replacing the zero grid edges.

    ``hlo``/``hhi``: (1, Y, Z) ``current`` rows at local x = −1 / x = X
    (the neighbour shards' edge rows; zeros at the global grid ends, which
    reproduces the unsharded kernel exactly)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    c = cur_ref[...]
    W = code_ref[...]
    row = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
    up = jnp.concatenate([cur_lo_ref[XT - 1:], c[:-1]], axis=0)
    dn = jnp.concatenate([c[1:], cur_hi_ref[:1]], axis=0)
    up = jnp.where((i == 0) & (row == 0), hlo_ref[...], up)
    dn = jnp.where((i == n - 1) & (row == XT - 1), hhi_ref[...], dn)
    zy = jnp.zeros_like(c[:, :1])
    zz = jnp.zeros_like(c[:, :, :1])
    shifts = (up, dn,
              jnp.concatenate([zy, c[:, :-1]], axis=1),
              jnp.concatenate([c[:, 1:], zy], axis=1),
              jnp.concatenate([zz, c[:, :, :-1]], axis=2),
              jnp.concatenate([c[:, :, 1:], zz], axis=2))
    acc = jnp.zeros_like(c)
    for d in range(6):
        acc = acc + _weight(W, d) * shifts[d]
    is_int = ((W >> 12) & 1).astype(c.dtype)
    out_ref[...] = COURANT_SQ * acc - is_int * prev_ref[...]


def _wkernel_bwd_haloed(g_lo_ref, g_ref, g_hi_ref, w_lo_ref, w_ref,
                        w_hi_ref, gcur_ref, ghlo_ref, ghhi_ref):
    """Adjoint of _wkernel_haloed w.r.t. ``current``, plus the halo-input
    cotangents (the transposed shard_map ppermute routes them back to the
    neighbours' edge rows).  Beyond-shard ḡ is zero here — the neighbour's
    own ĝhalo carries that contribution."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    g = g_ref[...]
    gs = _shifts_in_kernel(g, g_lo_ref, g_hi_ref, i, n)
    W = w_ref[...]
    ws = _shifts_in_kernel(W, w_lo_ref, w_hi_ref, i, n)
    acc = jnp.zeros_like(g)
    for dd in range(6):
        acc = acc + _weight(ws[dd], _OPPOSITE[dd]) * gs[dd]
    gcur_ref[...] = COURANT_SQ * acc

    # hlo feeds only local row 0 through direction 0 (reads cur[r−1]);
    # hhi only the last row through direction 1
    @pl.when(i == 0)
    def _():
        ghlo_ref[...] = COURANT_SQ * _weight(W[:1], 0) * g[:1]

    @pl.when(i == n - 1)
    def _():
        ghhi_ref[...] = COURANT_SQ * _weight(W[XT - 1:], 1) * g[XT - 1:]


def _weighted_sharded_jnp(current, previous, weight_code, halos):
    out = weighted_step_jnp(current, previous, weight_code)
    w0 = (((weight_code[:1] >> 0) & 1)
          + ((weight_code[:1] >> 6) & 1)).astype(current.dtype)
    w1 = (((weight_code[-1:] >> 1) & 1)
          + ((weight_code[-1:] >> 7) & 1)).astype(current.dtype)
    out = out.at[:1].add(COURANT_SQ * w0 * halos[0])
    out = out.at[-1:].add(COURANT_SQ * w1 * halos[1])
    return out


@jax.custom_vjp
def weighted_step_sharded(current, previous, weight_code, halos):
    """``weighted_step`` for one x-shard of a decomposed grid.

    ``halos``: (hlo, hhi) pair of (1, Y, Z) ``current`` rows at local
    x = −1 / x = X from the neighbouring shards (zeros at the global grid
    ends).  Linear in (current, previous, halos); hand VJP emits halo
    cotangents so the shard_map ppermute transposes correctly."""
    if use_pallas(current.shape):
        X, Y, Z = current.shape
        nb = X // XT

        def tile(i):
            return (i, 0, 0)

        def tile_lo(i):
            return (jnp.maximum(i - 1, 0), 0, 0)

        def tile_hi(i):
            return (jnp.minimum(i + 1, nb - 1), 0, 0)

        def spec(im, shape=(XT, Y, Z)):
            return pl.BlockSpec(shape, im, memory_space=pltpu.VMEM)

        def full():
            return pl.BlockSpec(memory_space=pltpu.VMEM)

        return pl.pallas_call(
            _wkernel_haloed,
            grid=(nb,),
            in_specs=[spec(tile_lo), spec(tile), spec(tile_hi),
                      spec(tile), spec(tile), full(), full()],
            out_specs=spec(tile),
            out_shape=jax.ShapeDtypeStruct((X, Y, Z), current.dtype),
        )(current, current, current, previous, weight_code,
          halos[0], halos[1])
    return _weighted_sharded_jnp(current, previous, weight_code, halos)


def _weighted_sharded_fwd(current, previous, weight_code, halos):
    return weighted_step_sharded(current, previous, weight_code,
                                 halos), weight_code


def _weighted_sharded_bwd(weight_code, g):
    import numpy as np
    from jax.dtypes import float0
    X, Y, Z = g.shape
    if use_pallas(g.shape):
        nb = X // XT

        def tile(i):
            return (i, 0, 0)

        def tile_lo(i):
            return (jnp.maximum(i - 1, 0), 0, 0)

        def tile_hi(i):
            return (jnp.minimum(i + 1, nb - 1), 0, 0)

        def spec(im):
            return pl.BlockSpec((XT, Y, Z), im, memory_space=pltpu.VMEM)

        def full():
            return pl.BlockSpec(memory_space=pltpu.VMEM)

        cur_bar, ghlo, ghhi = pl.pallas_call(
            _wkernel_bwd_haloed,
            grid=(nb,),
            in_specs=[spec(tile_lo), spec(tile), spec(tile_hi),
                      spec(tile_lo), spec(tile), spec(tile_hi)],
            out_specs=(spec(tile), full(), full()),
            out_shape=(jax.ShapeDtypeStruct((X, Y, Z), g.dtype),
                       jax.ShapeDtypeStruct((1, Y, Z), g.dtype),
                       jax.ShapeDtypeStruct((1, Y, Z), g.dtype)),
        )(g, g, g, weight_code, weight_code, weight_code)
    else:
        # reuse the unsharded jnp transpose, then read off the halo rows
        cur_bar, _, _ = _weighted_bwd(weight_code, g)
        w0 = (((weight_code[:1] >> 0) & 1)
              + ((weight_code[:1] >> 6) & 1)).astype(g.dtype)
        w1 = (((weight_code[-1:] >> 1) & 1)
              + ((weight_code[-1:] >> 7) & 1)).astype(g.dtype)
        ghlo = COURANT_SQ * w0 * g[:1]
        ghhi = COURANT_SQ * w1 * g[-1:]
    is_int = ((weight_code >> 12) & 1).astype(g.dtype)
    prev_bar = -is_int * g
    return (cur_bar, prev_bar,
            np.zeros(weight_code.shape, dtype=float0), (ghlo, ghhi))


weighted_step_sharded.defvjp(_weighted_sharded_fwd, _weighted_sharded_bwd)
