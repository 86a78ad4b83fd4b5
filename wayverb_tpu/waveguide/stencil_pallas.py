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
