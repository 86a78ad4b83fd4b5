"""The FDTD update step: dense interior stencil + compact boundary pass.

Physics (parity: reference ``waveguide/src/program.cpp``):
 * interior / reentrant:  p⁺ = (Σ₆ neighbours)/3 − p⁻        (:393-412)
 * d-dim boundary node (d = 1, 2, 3) with inner directions D (:331-388):
     csw = λ²·( Σ_{i∈D} 2·p[inner_i] + Σ_{surrounding} p[s] )
     fw  = λ²·Σ_{i∈D} m_i[0]/b0_i
     cw  = λ ·Σ_{i∈D} a0_i/b0_i
     p⁺  = (csw + fw + (cw−1)·p⁻) / (1 + cw)
   then per inner slot the ghost-point filter state advances with input
   −( a0·(p⁻ − p⁺)/(b0·λ) + m0/b0 ) through the canonical DF2T step
   (:150-174, filters.cpp), output discarded.
 * λ = 1/√3 (Courant number, :12-13); outside nodes stay at 0.

TPU-first: the interior term is six jnp.rolls of a zero-padded field — XLA
fuses them into one bandwidth-bound pass (a Pallas kernel with explicit VMEM
blocking lives in ``stencil_pallas.py``); the irregular boundary work is a
compact gather → arithmetic → scatter, O(surface) not O(volume), instead of
the reference's per-node switch.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from wayverb_tpu.waveguide.descriptor import COURANT, COURANT_SQ
from wayverb_tpu.waveguide.setup import MeshStructure


def _neighbor_sum(field):
    """Σ of the six face neighbours, zero outside the grid."""
    total = jnp.zeros_like(field)
    for axis in range(3):
        n = field.shape[axis]
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(0, n - 1)
        hi[axis] = slice(1, n)
        pad = [(0, 0)] * 3
        pad_lo = list(pad)
        pad_lo[axis] = (1, 0)
        pad_hi = list(pad)
        pad_hi[axis] = (0, 1)
        # neighbour at -axis: value of field[i-1]
        total = total + jnp.pad(field[tuple(lo)], pad_lo)
        # neighbour at +axis: value of field[i+1]
        total = total + jnp.pad(field[tuple(hi)], pad_hi)
    return total


def interior_step(current, previous, interior_mask):
    """Masked 7-point update (includes reentrant nodes)."""
    return (COURANT_SQ * _neighbor_sum(current) - previous) * interior_mask


def expand_boundary_coefficients(s: MeshStructure):
    """Per-node (B, 3, order+1) coefficient tables.

    Hoist this OUT of the time loop: the (S, o+1) → (B, 3, o+1) gather is
    constant across a run, and on TPU doing it per step costs ~50 MB of
    gather traffic each iteration.  Gradients w.r.t. ``coef_b``/``coef_a``
    still flow (the gather transposes to one scatter-add per run).
    """
    return s.coef_b[s.b_slot_coef], s.coef_a[s.b_slot_coef]


def prepare_boundary_tables(s: MeshStructure, expanded=None):
    """Per-node derived coefficient tables, hoisted OUT of the time loop.

    Everything here is constant across a run (but still a traced function
    of ``coef_b``/``coef_a`` so coefficient gradients flow); computing the
    divisions and the static ``cw`` once instead of per step removes
    ~2/3 of the compact boundary pass's elementwise work on TPU.
    """
    bc, ac = expanded if expanded is not None \
        else expand_boundary_coefficients(s)                    # (B, 3, o+1)
    b0 = bc[..., 0]
    a0 = ac[..., 0]
    mask = s.b_slot_mask                                        # (B, 3)
    inv_b0m = mask / b0                                         # (B, 3)
    cw = COURANT * jnp.sum(mask * a0 / b0, axis=-1)             # (B,) static
    k_delta = a0 / (b0 * COURANT)                               # (B, 3)
    r_out = b0 / a0                                             # (B, 3)
    inv_a0 = 1.0 / a0
    return (bc, ac, inv_b0m, cw, k_delta, r_out, inv_a0, mask)


def boundary_update(csw, prev, filter_state, s: MeshStructure,
                    expanded=None, tables=None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Boundary-node pressures + advanced filter state, given each node's
    weighted neighbour sum ``csw`` (B,) and previous pressure ``prev`` (B,).

    ``expanded``: optional precomputed ``expand_boundary_coefficients(s)``;
    ``tables``: optional precomputed ``prepare_boundary_tables`` (hoist it
    out of the scan — see there).
    Returns (new_pressures (B,), new_filter_state (B, 3, order)).
    """
    if tables is None:
        tables = prepare_boundary_tables(s, expanded)
    bc, ac, inv_b0m, cw, k_delta, r_out, inv_a0, mask = tables
    m0 = filter_state[..., 0]                                   # (B, 3)

    fw = COURANT_SQ * jnp.sum(m0 * inv_b0m, axis=-1)
    new_p = (csw + fw + (cw - 1.0) * prev) / (1.0 + cw)

    # ghost-point filter update per slot (output discarded)
    filt_in = -(k_delta * (prev - new_p)[:, None] + m0 * inv_b0m)
    out = filt_in * r_out + m0 * inv_a0                         # (B, 3)
    shifted = jnp.concatenate(
        [filter_state[..., 1:], jnp.zeros_like(filter_state[..., :1])],
        axis=-1)
    new_state = shifted + bc[..., 1:] * filt_in[..., None] \
        - ac[..., 1:] * out[..., None]
    new_state = jnp.where(mask[..., None] > 0, new_state, filter_state)
    return new_p, new_state


def boundary_step(current_flat, previous_flat, filter_state,
                  s: MeshStructure) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-based boundary pass (the original slow path, kept as the
    oracle for ``waveguide_step``'s fused formulation)."""
    neigh = current_flat[s.b_neighbor_idx]                      # (B, 6)
    csw = COURANT_SQ * jnp.sum(neigh * s.b_neighbor_w, axis=-1)
    prev = previous_flat[s.b_node_idx]                          # (B,)
    return boundary_update(csw, prev, filter_state, s)


def waveguide_step_reference(current, previous, filter_state,
                             s: MeshStructure):
    """One full mesh update via the (B, 6) gather boundary pass.

    Kept as a parity oracle; ``waveguide_step`` below is the fast path.
    """
    from wayverb_tpu.waveguide.stencil_pallas import interior_step_auto
    nxt = interior_step_auto(current, previous, s.interior_mask)
    flat_shape = current.shape[0] * current.shape[1] * current.shape[2]
    cur_flat = current.reshape(flat_shape)
    prev_flat = previous.reshape(flat_shape)
    bp, new_state = boundary_step(cur_flat, prev_flat, filter_state, s)
    nxt_flat = nxt.reshape(flat_shape).at[s.b_node_idx].set(bp)
    return nxt_flat.reshape(current.shape), new_state


def waveguide_step(current, previous, filter_state, s: MeshStructure,
                   expanded=None):
    """One full mesh update (fused general path).

    The dense weighted pass (``stencil_pallas.weighted_step``, driven by the
    packed ``s.weight_code`` bitfield) yields the interior update AND every
    boundary node's weighted neighbour sum in one kernel; the compact pass
    then only gathers one value per boundary node, advances the impedance
    filters, and scatters the corrected pressures — the (B, 6) neighbour
    gather of ``waveguide_step_reference`` disappears (VERDICT r2 #8; the
    reference's one-kernel-per-step treatment is ``program.cpp:393-487``).

    ``b_node_idx`` comes from np.argwhere, so it is sorted and unique —
    the gather/scatter hints below let XLA skip its out-of-bounds and
    collision handling on the hot path.

    Returns (next_field, new_filter_state).
    """
    nxt, new_state, _ = waveguide_step_carried(
        current, previous, None, filter_state, s, expanded)
    return nxt, new_state


def boundary_pressures(field, s: MeshStructure):
    """(B,) pressures at the boundary nodes of a dense field."""
    n = field.shape[0] * field.shape[1] * field.shape[2]
    return field.reshape(n).at[s.b_node_idx].get(
        indices_are_sorted=True, unique_indices=True,
        mode="promise_in_bounds")


def waveguide_step_carried(current, previous, prev_b, filter_state,
                           s: MeshStructure, expanded=None, tables=None):
    """``waveguide_step`` with the boundary-node previous pressures carried
    compactly: ``prev_b`` is last step's returned ``bp`` (the values this
    step would otherwise re-gather from ``previous``), saving one sparse
    gather per step.  Pass ``prev_b=None`` to gather instead (first step /
    compatibility).

    Returns (next_field, new_filter_state, bp) — carry ``bp`` forward.
    """
    from wayverb_tpu.waveguide.stencil_pallas import weighted_step
    dense = weighted_step(current, previous, s.weight_code)
    flat_shape = current.shape[0] * current.shape[1] * current.shape[2]
    dense_flat = dense.reshape(flat_shape)
    csw = dense_flat.at[s.b_node_idx].get(
        indices_are_sorted=True, unique_indices=True,
        mode="promise_in_bounds")                               # (B,)
    if prev_b is None:
        prev_b = boundary_pressures(previous, s)
    bp, new_state = boundary_update(csw, prev_b, filter_state, s,
                                    expanded, tables)
    nxt_flat = dense_flat.at[s.b_node_idx].set(
        bp, indices_are_sorted=True, unique_indices=True,
        mode="promise_in_bounds")
    return nxt_flat.reshape(current.shape), new_state, bp
