"""Source preprocessors: how excitation enters the mesh each step.

Parity: reference ``waveguide/preprocessor/hard_source.h`` (overwrite node),
``soft_source.h`` (add), ``gaussian.h`` (3D gaussian ball × signal sample),
``calibration.h:26-31`` (injection scale √(Z/4π)/(0.3405·Δx)).

Each source is data (node index / position weights + signal); injection is a
pure function applied inside the scan body.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

import numpy as np

from wayverb_tpu.waveguide.descriptor import MeshDescriptor


def _unravel(flat_idx, dims):
    """flat (C-order) → (x, y, z) coordinates, traced-compatible."""
    yz = dims[1] * dims[2]
    x = flat_idx // yz
    rem = flat_idx % yz
    return x, rem // dims[2], rem % dims[2]


def _plane_uv(x, y, z, axis):
    if axis == 0:
        return y, z
    if axis == 1:
        return x, z
    return x, y


def _inner_plane_targets(node_idx, spec, dims):
    """(plane, u, v, on) arrays mapping a node to each of the six carried
    inner planes of the fused box solver (box_fused.PLANES order)."""
    x, y, z = _unravel(node_idx, dims)
    xyz = (x, y, z)
    pis, us, vs, ons = [], [], [], []
    for pi, (a, s) in enumerate(
            ((0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (2, 1))):
        coord = spec.ilo[a] if s == 0 else spec.ihi[a]
        u, v = _plane_uv(x, y, z, a)
        pis.append(jnp.full_like(x, pi))
        us.append(u)
        vs.append(v)
        ons.append(xyz[a] == coord)
    return (jnp.stack(pis), jnp.stack(us), jnp.stack(vs), jnp.stack(ons))


def rectilinear_calibration_factor(grid_spacing: float,
                                   acoustic_impedance: float) -> float:
    """Level-matching injection scale (siltanen2013; calibration.h)."""
    distance_for_unit_pressure = math.sqrt(acoustic_impedance / (4 * math.pi))
    return distance_for_unit_pressure / (0.3405 * grid_spacing)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class HardSource:
    """Overwrite the source node's pressure with signal[t]."""

    node_idx: Any     # scalar int32 flat index
    signal: Any       # (T,)

    def tree_flatten(self):
        return (self.node_idx, self.signal), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def inject(self, field_flat, t):
        return field_flat.at[self.node_idx].set(self.signal[t])

    def patch_plane(self, plane, axis, coord, dims, t):
        """Mirror the injection onto a carried 2-D plane of the field
        (box_fused solver: the inner planes are carried, not re-sliced)."""
        x, y, z = _unravel(self.node_idx, dims)
        u, v = _plane_uv(x, y, z, axis)
        on = (x, y, z)[axis] == coord
        return plane.at[u, v].set(
            jnp.where(on, self.signal[t].astype(plane.dtype), plane[u, v]))

    def patch_planes_stacked(self, stack, spec, dims, t):
        """One-scatter version of patch_plane over the stacked (6, U, V)
        inner planes (box_fused's hot path)."""
        pis, us, vs, ons = _inner_plane_targets(self.node_idx, spec, dims)
        old = stack[pis, us, vs]
        val = jnp.where(ons, self.signal[t].astype(stack.dtype), old)
        return stack.at[pis, us, vs].set(val)

    def patch_tap(self, idx, values, t):
        """Apply the pending injection to values gathered at flat ``idx``."""
        return jnp.where(idx == self.node_idx,
                         self.signal[t].astype(values.dtype), values)

    def kernel_injection(self, dims, t):
        """(inj_idx, inj_val) for the fused kernel's in-kernel injection."""
        x, y, z = _unravel(self.node_idx, dims)
        idx = jnp.stack([x, y, z, jnp.ones_like(x)]).astype(jnp.int32)
        v = self.signal[t]
        vp = jnp.where(t > 0, self.signal[jnp.maximum(t - 1, 0)], 0.0)
        return idx, jnp.stack([v, vp]).astype(jnp.float32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SoftSource:
    """Add signal[t] to the source node's pressure."""

    node_idx: Any
    signal: Any

    def tree_flatten(self):
        return (self.node_idx, self.signal), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def inject(self, field_flat, t):
        return field_flat.at[self.node_idx].add(self.signal[t])

    def patch_plane(self, plane, axis, coord, dims, t):
        x, y, z = _unravel(self.node_idx, dims)
        u, v = _plane_uv(x, y, z, axis)
        on = (x, y, z)[axis] == coord
        return plane.at[u, v].add(
            jnp.where(on, self.signal[t], 0.0).astype(plane.dtype))

    def patch_planes_stacked(self, stack, spec, dims, t):
        pis, us, vs, ons = _inner_plane_targets(self.node_idx, spec, dims)
        val = jnp.where(ons, self.signal[t], 0.0).astype(stack.dtype)
        return stack.at[pis, us, vs].add(val)

    def patch_tap(self, idx, values, t):
        return values + jnp.where(idx == self.node_idx,
                                  self.signal[t], 0.0).astype(values.dtype)

    def kernel_injection(self, dims, t):
        """(inj_idx, inj_val) for the fused kernel's in-kernel injection."""
        x, y, z = _unravel(self.node_idx, dims)
        idx = jnp.stack([x, y, z, 2 * jnp.ones_like(x)]).astype(jnp.int32)
        v = self.signal[t]
        vp = jnp.where(t > 0, self.signal[jnp.maximum(t - 1, 0)], 0.0)
        return idx, jnp.stack([v, vp]).astype(jnp.float32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GaussianSource:
    """Soft injection over a gaussian ball of nodes (preprocessor/gaussian.h)."""

    node_indices: Any  # (K,) flat indices within the ball support
    weights: Any       # (K,) gaussian weights
    signal: Any        # (T,)

    def tree_flatten(self):
        return (self.node_indices, self.weights, self.signal), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def inject(self, field_flat, t):
        return field_flat.at[self.node_indices].add(
            self.weights * self.signal[t])

    def patch_plane(self, plane, axis, coord, dims, t):
        x, y, z = _unravel(self.node_indices, dims)
        u, v = _plane_uv(x, y, z, axis)
        on = (x, y, z)[axis] == coord
        return plane.at[u, v].add(
            (jnp.where(on, self.weights, 0.0)
             * self.signal[t]).astype(plane.dtype))

    def patch_planes_stacked(self, stack, spec, dims, t):
        pis, us, vs, ons = _inner_plane_targets(self.node_indices, spec,
                                                dims)   # (6, K) each
        val = (jnp.where(ons, self.weights[None, :], 0.0)
               * self.signal[t]).astype(stack.dtype)
        return stack.at[pis, us, vs].add(val)


def make_gaussian_source(desc: MeshDescriptor, centre, sdev: float,
                         signal, support_radius_cells: int = 4,
                         inside=None) -> GaussianSource:
    """Gaussian ball centred at ``centre`` with spatial σ ``sdev`` metres.

    ``inside``: optional (X, Y, Z) bool mask; when given, the support is
    clipped to INSIDE nodes.  Injecting onto boundary nodes is meaningless
    (the boundary update overwrites them next step) and diverges between
    the gather and fused-plane solvers, so near-wall sources should pass
    the mesh's inside mask (ADVICE r2).
    """
    loc = desc.locator(centre)
    r = support_radius_cells
    offs = np.stack(np.meshgrid(*([np.arange(-r, r + 1)] * 3),
                                indexing="ij"), axis=-1).reshape(-1, 3)
    locs = loc[None, :] + offs
    dims = np.asarray(desc.dimensions)
    ok = np.all((locs >= 0) & (locs < dims), axis=-1)
    locs = locs[ok]
    if inside is not None:
        inside = np.asarray(inside)
        locs = locs[inside[locs[:, 0], locs[:, 1], locs[:, 2]]]
    pos = desc.position(locs)
    d2 = np.sum((pos - np.asarray(centre)) ** 2, axis=-1)
    w = np.exp(-d2 / (2.0 * sdev * sdev))
    flat = np.ravel_multi_index(
        (locs[:, 0], locs[:, 1], locs[:, 2]), desc.dimensions)
    return GaussianSource(
        node_indices=jnp.asarray(flat.astype(np.int32)),
        weights=jnp.asarray(w.astype(np.float32)),
        signal=jnp.asarray(signal, dtype=jnp.float32),
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PositionGaussianSource:
    """Gaussian-ball soft source whose weights are a TRACED function of a
    continuous position — the IR differentiates w.r.t. ``position``
    (BASELINE: "gradients w.r.t. source/receiver positions"; the reference
    is not differentiable anywhere).

    The support window (node indices/positions) is fixed at construction
    around the nominal position; gradients are exact for perturbations that
    keep the ball inside the window (support_radius_cells of margin).
    """

    node_indices: Any   # (K,) flat indices of the support window
    node_positions: Any  # (K, 3) node positions
    position: Any        # (3,) continuous source position — differentiable
    sdev: Any            # spatial σ in metres
    signal: Any          # (T,)

    def tree_flatten(self):
        return (self.node_indices, self.node_positions, self.position,
                self.sdev, self.signal), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def weights(self):
        d2 = jnp.sum((self.node_positions
                      - self.position[None, :]) ** 2, axis=-1)
        return jnp.exp(-d2 / (2.0 * self.sdev * self.sdev))

    def inject(self, field_flat, t):
        return field_flat.at[self.node_indices].add(
            (self.weights() * self.signal[t]).astype(field_flat.dtype))

    def patch_plane(self, plane, axis, coord, dims, t):
        x, y, z = _unravel(self.node_indices, dims)
        u, v = _plane_uv(x, y, z, axis)
        on = (x, y, z)[axis] == coord
        return plane.at[u, v].add(
            (jnp.where(on, self.weights(), 0.0)
             * self.signal[t]).astype(plane.dtype))

    def patch_planes_stacked(self, stack, spec, dims, t):
        pis, us, vs, ons = _inner_plane_targets(self.node_indices, spec,
                                                dims)
        val = (jnp.where(ons, self.weights()[None, :], 0.0)
               * self.signal[t]).astype(stack.dtype)
        return stack.at[pis, us, vs].add(val)


def make_position_source(desc: MeshDescriptor, centre, sdev: float, signal,
                         inside, support_radius_cells: int = 4
                         ) -> PositionGaussianSource:
    """Differentiable-position source: static inside-clipped support window
    around ``centre``, traced Gaussian weights."""
    loc = desc.locator(centre)
    r = support_radius_cells
    offs = np.stack(np.meshgrid(*([np.arange(-r, r + 1)] * 3),
                                indexing="ij"), axis=-1).reshape(-1, 3)
    locs = loc[None, :] + offs
    dims = np.asarray(desc.dimensions)
    ok = np.all((locs >= 0) & (locs < dims), axis=-1)
    locs = locs[ok]
    inside = np.asarray(inside)
    locs = locs[inside[locs[:, 0], locs[:, 1], locs[:, 2]]]
    flat = np.ravel_multi_index(
        (locs[:, 0], locs[:, 1], locs[:, 2]), desc.dimensions)
    return PositionGaussianSource(
        node_indices=jnp.asarray(flat.astype(np.int32)),
        node_positions=jnp.asarray(
            np.asarray(desc.position(locs)).astype(np.float32)),
        position=jnp.asarray(centre, dtype=jnp.float32),
        sdev=jnp.float32(sdev),
        signal=jnp.asarray(signal, dtype=jnp.float32),
    )


def impulse_signal(num_steps: int, amplitude: float) -> jnp.ndarray:
    """[amplitude, 0, 0, ...] — the canonical calibrated impulse input."""
    return jnp.zeros(num_steps, dtype=jnp.float32).at[0].set(amplitude)
