"""Multi-chip execution: spatial domain decomposition for the FDTD mesh and
pure data parallelism for rays.

The reference is strictly single-device (SURVEY.md §2.6).  Here:

 * the 3D pressure grid is sharded along x over a ``jax.sharding.Mesh``
   axis; every timestep exchanges 1-deep faces with neighbours via
   ``lax.ppermute`` (the context-parallel analogue for a stencil), and the
   whole time loop runs inside one ``shard_map`` — no per-step host sync.
 * boundary nodes are partitioned per shard at setup (padded to the max
   shard count so shapes stay static), with neighbour gathers indexing the
   halo-extended local block.
 * rays shard across chips as a batch axis; the energy histogram is
   ``psum``-reduced.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wayverb_tpu.waveguide.descriptor import COURANT, COURANT_SQ
from wayverb_tpu.waveguide.setup import MeshStructure


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ShardedStructure:
    """Per-shard boundary data; leading axis = shard.

    Local pressure blocks are halo-extended along x by one plane on each
    side; all flat indices below index that extended (lx+2, Y, Z) block.
    """

    interior_mask: Any      # (n, lx, Y, Z) — sharded as the field is
    b_node_idx: Any         # (n, B, ) int32 into extended local block
    b_neighbor_idx: Any     # (n, B, 6)
    b_neighbor_w: Any       # (n, B, 6)
    b_slot_mask: Any        # (n, B, 3)
    b_slot_coef: Any        # (n, B, 3)
    b_valid: Any            # (n, B) f32 — padding rows are 0
    coef_b: Any             # (S, o+1) replicated
    coef_a: Any             # (S, o+1)

    def tree_flatten(self):
        return (self.interior_mask, self.b_node_idx, self.b_neighbor_idx,
                self.b_neighbor_w, self.b_slot_mask, self.b_slot_coef,
                self.b_valid, self.coef_b, self.coef_a), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def shard_structure(structure: MeshStructure, dims: Tuple[int, int, int],
                    num_shards: int) -> Tuple[ShardedStructure, tuple]:
    """Partition a MeshStructure along x (host-side, numpy).

    Returns (sharded_structure, padded_dims).  The grid is zero-padded so
    x divides evenly; padded nodes are outside (inactive).
    """
    X, Y, Z = dims
    lx = -(-X // num_shards)
    Xp = lx * num_shards

    interior = np.zeros((Xp, Y, Z), dtype=np.float32)
    interior[:X] = np.asarray(structure.interior_mask)
    interior = interior.reshape(num_shards, lx, Y, Z)

    node = np.asarray(structure.b_node_idx)
    gx, rem = np.divmod(node, Y * Z)
    gy, gz = np.divmod(rem, Z)
    shard_of = gx // lx
    x_local = gx - shard_of * lx

    neigh = np.asarray(structure.b_neighbor_idx)
    ngx, nrem = np.divmod(neigh, Y * Z)
    ngy, ngz = np.divmod(nrem, Z)

    counts = np.bincount(shard_of, minlength=num_shards)
    B = max(int(counts.max()), 1)

    def ext_flat(xl, y, z):
        """Flat index into the halo-extended (lx+2, Y, Z) block."""
        return ((xl + 1) * Y + y) * Z + z

    sh = {
        "b_node_idx": np.zeros((num_shards, B), np.int32),
        "b_neighbor_idx": np.zeros((num_shards, B, 6), np.int32),
        "b_neighbor_w": np.zeros((num_shards, B, 6), np.float32),
        "b_slot_mask": np.zeros((num_shards, B, 3), np.float32),
        "b_slot_coef": np.zeros((num_shards, B, 3), np.int32),
        "b_valid": np.zeros((num_shards, B), np.float32),
    }
    w = np.asarray(structure.b_neighbor_w)
    smask = np.asarray(structure.b_slot_mask)
    scoef = np.asarray(structure.b_slot_coef)
    for s in range(num_shards):
        sel = np.nonzero(shard_of == s)[0]
        k = len(sel)
        if k == 0:
            continue
        sh["b_node_idx"][s, :k] = ext_flat(x_local[sel], gy[sel], gz[sel])
        nxl = ngx[sel] - s * lx      # may be -1 or lx (halo planes)
        sh["b_neighbor_idx"][s, :k] = ext_flat(nxl, ngy[sel], ngz[sel])
        sh["b_neighbor_w"][s, :k] = w[sel]
        sh["b_slot_mask"][s, :k] = smask[sel]
        sh["b_slot_coef"][s, :k] = scoef[sel]
        sh["b_valid"][s, :k] = 1.0

    return ShardedStructure(
        interior_mask=jnp.asarray(interior),
        b_node_idx=jnp.asarray(sh["b_node_idx"]),
        b_neighbor_idx=jnp.asarray(sh["b_neighbor_idx"]),
        b_neighbor_w=jnp.asarray(sh["b_neighbor_w"]),
        b_slot_mask=jnp.asarray(sh["b_slot_mask"]),
        b_slot_coef=jnp.asarray(sh["b_slot_coef"]),
        b_valid=jnp.asarray(sh["b_valid"]),
        coef_b=structure.coef_b,
        coef_a=structure.coef_a,
    ), (Xp, Y, Z)


def _halo_exchange(field, axis_name: str):
    """Append one x-plane from each neighbour: (lx, Y, Z) → (lx+2, Y, Z)."""
    n = jax.lax.psum(1, axis_name)
    right_to_left = [(i, (i - 1) % n) for i in range(n)]
    left_to_right = [(i, (i + 1) % n) for i in range(n)]
    # receive my right neighbour's first plane as my top halo
    from_right = jax.lax.ppermute(field[:1], axis_name, right_to_left)
    from_left = jax.lax.ppermute(field[-1:], axis_name, left_to_right)
    idx = jax.lax.axis_index(axis_name)
    zero = jnp.zeros_like(field[:1])
    low_halo = jnp.where(idx == 0, zero, from_left)
    high_halo = jnp.where(idx == n - 1, zero, from_right)
    return jnp.concatenate([low_halo, field, high_halo], axis=0)


def _local_step(cur, prev, fstate, s: ShardedStructure, axis_name: str):
    """One FDTD step on a local block (shard_map body helper).

    cur/prev: (lx, Y, Z) local blocks (no halo).  Returns same shape.
    """
    ext = _halo_exchange(cur, axis_name)                # (lx+2, Y, Z)
    lx, Y, Z = cur.shape

    # interior: 6-neighbour sum on the extended block
    total = (ext[:-2] + ext[2:]
             + jnp.pad(ext[1:-1, :-1], ((0, 0), (1, 0), (0, 0)))
             + jnp.pad(ext[1:-1, 1:], ((0, 0), (0, 1), (0, 0)))
             + jnp.pad(ext[1:-1, :, :-1], ((0, 0), (0, 0), (1, 0)))
             + jnp.pad(ext[1:-1, :, 1:], ((0, 0), (0, 0), (0, 1))))
    nxt = (COURANT_SQ * total - prev) * s.interior_mask

    # boundary pass on the extended flat block
    ext_flat = ext.reshape(-1)
    neigh = ext_flat[s.b_neighbor_idx]                  # (B, 6)
    csw = COURANT_SQ * jnp.sum(neigh * s.b_neighbor_w, axis=-1)

    bc = s.coef_b[s.b_slot_coef]
    ac = s.coef_a[s.b_slot_coef]
    b0, a0 = bc[..., 0], ac[..., 0]
    m0 = fstate[..., 0]
    mask = s.b_slot_mask
    fw = COURANT_SQ * jnp.sum(mask * m0 / b0, axis=-1)
    cw = COURANT * jnp.sum(mask * a0 / b0, axis=-1)

    prev_ext = jnp.pad(prev, ((1, 1), (0, 0), (0, 0))).reshape(-1)
    prev_b = prev_ext[s.b_node_idx]
    new_p = (csw + fw + (cw - 1.0) * prev_b) / (1.0 + cw)
    new_p = new_p * s.b_valid

    filt_in = -((a0 * (prev_b - new_p)[:, None]) / (b0 * COURANT) + m0 / b0)
    out = (filt_in * b0 + m0) / a0
    shifted = jnp.concatenate(
        [fstate[..., 1:], jnp.zeros_like(fstate[..., :1])], axis=-1)
    new_state = shifted + bc[..., 1:] * filt_in[..., None] \
        - ac[..., 1:] * out[..., None]
    new_state = jnp.where((mask * s.b_valid[:, None])[..., None] > 0,
                          new_state, fstate)

    nxt_ext = jnp.pad(nxt, ((1, 1), (0, 0), (0, 0))).reshape(-1)
    nxt_ext = nxt_ext.at[s.b_node_idx].set(new_p)
    nxt = nxt_ext.reshape(lx + 2, Y, Z)[1:-1]
    return nxt, new_state


def sharded_run_waveguide(mesh: Mesh, axis_name: str,
                          sharded: ShardedStructure,
                          padded_dims: Tuple[int, int, int],
                          source_flat_idx: int, receiver_flat_idx: int,
                          signal, num_steps: int):
    """Scan the sharded mesh; returns (T,) pressure at the receiver node.

    Source/receiver flat indices are GLOBAL (into the padded grid); each
    shard applies them only if local.  The entire scan runs inside one
    shard_map — the only cross-chip traffic is the per-step halo ppermute
    and one psum per receiver sample.
    """
    Xp, Y, Z = padded_dims
    n = mesh.devices.size
    lx = Xp // n

    src_shard, src_rem = divmod(int(source_flat_idx), lx * Y * Z)
    rcv_shard, rcv_rem = divmod(int(receiver_flat_idx), lx * Y * Z)

    def body(local_structure, signal):
        # sharded children arrive with a leading length-1 shard axis
        s = local_structure
        local_structure = ShardedStructure(
            interior_mask=s.interior_mask[0], b_node_idx=s.b_node_idx[0],
            b_neighbor_idx=s.b_neighbor_idx[0],
            b_neighbor_w=s.b_neighbor_w[0], b_slot_mask=s.b_slot_mask[0],
            b_slot_coef=s.b_slot_coef[0], b_valid=s.b_valid[0],
            coef_b=s.coef_b, coef_a=s.coef_a)
        axis = jax.lax.axis_index(axis_name)
        cur = jnp.zeros((lx, Y, Z))
        prev = jnp.zeros((lx, Y, Z))
        fstate = jnp.zeros(local_structure.b_slot_mask.shape + (
            local_structure.coef_b.shape[-1] - 1,))

        def step(carry, t):
            cur, prev, fstate = carry
            src_val = signal[t]
            cur_flat = cur.reshape(-1)
            inject = jnp.where(axis == src_shard, src_val,
                               cur_flat[src_rem])
            cur_flat = cur_flat.at[src_rem].set(inject)
            cur = cur_flat.reshape(lx, Y, Z)
            # receiver tap (psum so every shard returns the same value)
            tap = jnp.where(axis == rcv_shard, cur_flat[rcv_rem], 0.0)
            tap = jax.lax.psum(tap, axis_name)
            nxt, fstate = _local_step(cur, prev, fstate, local_structure,
                                      axis_name)
            return (nxt, cur, fstate), tap

        (_, _, _), taps = jax.lax.scan(
            step, (cur, prev, fstate), jnp.arange(num_steps))
        return taps

    spec_structure = ShardedStructure(
        interior_mask=P(axis_name),
        b_node_idx=P(axis_name), b_neighbor_idx=P(axis_name),
        b_neighbor_w=P(axis_name), b_slot_mask=P(axis_name),
        b_slot_coef=P(axis_name), b_valid=P(axis_name),
        coef_b=P(), coef_a=P())

    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec_structure, P()),
                   out_specs=P(),
                   check_vma=False)
    return fn(sharded, jnp.asarray(signal))


# ---------------------------------------------------------------------------
# data-parallel rays

def sharded_trace(mesh: Mesh, axis_name: str, soup, surfaces, source,
                  receiver, key, rays_per_device: int, depth: int,
                  max_time: float, **kwargs):
    """Trace rays sharded across chips; psum-reduced histogram.

    Each device traces ``rays_per_device`` with an independent fold of the
    key; total energy normalization uses the global ray count.
    """
    from wayverb_tpu.raytracer import tracer

    n = mesh.devices.size
    total_rays = rays_per_device * n

    def body(keys):
        key = keys[0]
        res = tracer.trace(soup, surfaces, source, receiver, key,
                           num_rays=rays_per_device, depth=depth,
                           max_time=max_time, **kwargs)
        # per-ray energy was normalized by rays_per_device; rescale to the
        # global count and sum across devices
        hist = res.histogram * (rays_per_device / total_rays)
        return jax.lax.psum(hist, axis_name)

    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))
    fn = shard_map(body, mesh=mesh, in_specs=(P(axis_name),),
                   out_specs=P(), check_vma=False)
    return fn(keys)


def make_device_mesh(n_devices: int | None = None,
                     axis_name: str = "x") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))
