"""Ablation timings for the fused box step at bench shape.

Isolates: (a) kernel+glue with the plane update stubbed out, (b) the plane
update alone, (c) the full body, (d) kernel alone in a raw scan.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402

from wayverb_tpu.core.geometry import Box                    # noqa: E402
from wayverb_tpu.waveguide import run as wgrun               # noqa: E402
from wayverb_tpu.waveguide.box_fused import (                # noqa: E402
    NO_INJECT, fused_step, initial_box_carry, make_box_body,
    plane_boundary_step_stacked, stack_planes, stacked_plane_shape,
    unstack_planes)
from wayverb_tpu.waveguide.descriptor import grid_spacing    # noqa: E402
from wayverb_tpu.waveguide.receivers import NodeReceiver     # noqa: E402
from wayverb_tpu.waveguide.sources import (HardSource,       # noqa: E402
                                           impulse_signal)

side = (224, 224, 256)
steps = 500
fs = 3333.33
dx = grid_spacing(340.0, 1.0 / fs)
box = Box((0, 0, 0), (dx * (side[0] - 4), dx * (side[1] - 4),
                      dx * (side[2] - 4)))
mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), dx, fs)
desc = mesh.descriptor
spec = mesh.box_spec
centre = tuple(np.asarray(box.centre()))
src_loc = mesh.require_inside(centre)
source = HardSource(
    node_idx=jnp.asarray(desc.flat_index(src_loc), dtype=jnp.int32),
    signal=impulse_signal(steps, 1.0))
receiver = NodeReceiver(node_idx=jnp.asarray(
    desc.flat_index(src_loc) + 2, dtype=jnp.int32))

structure = mesh.structure
face_idx = jnp.asarray(spec.face_surface, dtype=jnp.int32)
face_b = structure.coef_b[face_idx]
face_a = structure.coef_a[face_idx]
geom = spec.geom_array()
dims = spec.dims


def timeit(name, fn):
    float(fn())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name}: {dt*1e3/steps:.4f} ms/step  total {dt:.3f}s",
          flush=True)


# (c) full body
body = make_box_body(structure, spec, source, receiver)
init = initial_box_carry(structure, spec, receiver)


@jax.jit
def full():
    carry, outputs = jax.lax.scan(body, init, jnp.arange(steps))
    return jnp.sum(outputs ** 2) + 0.0 * carry[0][8, 8, 8]


timeit("full body", full)


# (a) kernel + glue, plane update stubbed (pplus = carried planes)
def body_noplanes(carry, t):
    current, previous, bcarry, rstate, ok = carry
    pl_s, in6, prev_pl_s, st_s = bcarry
    inj_idx, inj_val = source.kernel_injection(dims, t)
    rstate, outputs = receiver.tap(current.reshape(-1), rstate)
    pplus = unstack_planes(pl_s, spec)
    nxt, in6_next = fused_step(spec, geom, current, previous, pplus,
                               inj_idx, inj_val)
    return (nxt, current, (pl_s, in6_next, prev_pl_s, st_s), rstate,
            ok), outputs


@jax.jit
def noplanes():
    carry, outputs = jax.lax.scan(body_noplanes, init, jnp.arange(steps))
    return jnp.sum(outputs ** 2) + 0.0 * carry[0][8, 8, 8]


timeit("kernel+glue (planes stubbed)", noplanes)


# (b) plane update alone
pl0 = init[2][0]
st0 = init[2][3]


def body_planes(carry, t):
    pl_s, prev_pl_s, st_s = carry
    pplus_s, st_s = plane_boundary_step_stacked(
        pl_s, pl_s, prev_pl_s, st_s, spec, face_b, face_a)
    return (pplus_s, pl_s, st_s), pplus_s[0, 0, 0]


@jax.jit
def planes_only():
    carry, outputs = jax.lax.scan(body_planes, (pl0, pl0, st0),
                                  jnp.arange(steps))
    return jnp.sum(outputs)


timeit("plane update alone", planes_only)


# (d) kernel alone, minimal glue
planes0 = unstack_planes(pl0, spec)


def body_kernel(carry, t):
    cur, prev = carry
    nxt, _ = fused_step(spec, geom, cur, prev, planes0)
    return (nxt, cur), nxt[8, 8, 8]


@jax.jit
def kernel_only():
    carry, outputs = jax.lax.scan(body_kernel, (init[0], init[1]),
                                  jnp.arange(steps))
    return jnp.sum(outputs)


timeit("kernel alone", kernel_only)

# (e) stack/unstack + patch + tap glue alone
in60 = init[2][1]


def body_glue(carry, t):
    in6 = carry
    in_s = stack_planes(in6, spec, dtype=jnp.float32)
    in_s = source.patch_planes_stacked(in_s, spec, dims, t)
    return unstack_planes(in_s, spec), in_s[0, 0, 0]


@jax.jit
def glue_only():
    carry, outputs = jax.lax.scan(body_glue, in60, jnp.arange(steps))
    return jnp.sum(outputs)


timeit("stack+patch glue alone", glue_only)
