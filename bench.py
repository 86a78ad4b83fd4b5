"""Benchmark: waveguide mesh node-updates/s on one chip.

Prints ONE JSON line:
  {"metric": "waveguide_node_updates_per_s_per_chip", "value": N,
   "unit": "updates/s", "vs_baseline": N, "extra": {...}}

``vs_baseline`` is measured vs the HBM speed-of-light estimate for the
stencil (the reference publishes no throughput numbers — BASELINE.md — so
roofline fraction is the honest denominator): 3 × 4 B per node update
(read current + previous, write next; neighbour reads hit cache/fusion)
against the chip's HBM bandwidth.

Timing methodology: on the axon-tunnelled TPU, ``block_until_ready`` does
NOT reliably block and fresh computations pay a ~100 s remote compile, so
every timed function is a single jit that ends in a scalar, forced with
``float()`` (a device→host transfer of a computed scalar is the only
dependable sync).  Long scans (1000 steps) amortize the ~30 ms per-call
tunnel latency to <3 %.
"""

import json
import time

import numpy as np

# per-chip HBM bandwidth estimates (bytes/s)
HBM_BW = {
    "v5e": 819e9,
    "v5p": 2765e9,
    "v4": 1228e9,
    "cpu": 50e9,
}
BYTES_PER_NODE = 12.0


def detect_platform():
    import jax
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return "v5e"
    if "v5p" in kind or "v5" in kind:
        return "v5p"
    if "v4" in kind:
        return "v4"
    if d.platform == "cpu":
        return "cpu"
    return "v5e"


def _time_scalar_fn(fn, reps=3):
    """Compile+warm once, then time ``reps`` forced executions."""
    float(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        v = float(fn())
    return (time.perf_counter() - t0) / reps, v


def bench_waveguide(platform):
    import jax
    import jax.numpy as jnp
    from wayverb_tpu.core.geometry import Box
    from wayverb_tpu.waveguide import run as wgrun
    from wayverb_tpu.waveguide.box_fused import (initial_box_carry,
                                                 make_box_body)
    from wayverb_tpu.waveguide.descriptor import grid_spacing
    from wayverb_tpu.waveguide.receivers import NodeReceiver
    from wayverb_tpu.waveguide.sources import HardSource, impulse_signal

    # a production-scale mesh: ~12.8 M nodes (the reference operating point
    # for a concert hall at 500 Hz cutoff is of this order)
    if platform == "cpu":
        side = (64, 64, 128)
        steps = 50
    else:
        side = (224, 224, 256)
        steps = 1000

    fs = 3333.33
    dx = grid_spacing(340.0, 1.0 / fs)
    box = Box((0, 0, 0), (dx * (side[0] - 4), dx * (side[1] - 4),
                          dx * (side[2] - 4)))
    mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), dx, fs)
    desc = mesh.descriptor
    num_nodes = desc.num_nodes

    centre = tuple(np.asarray(box.centre()))
    src_loc = mesh.require_inside(centre)
    rcv_loc = mesh.require_inside(
        tuple(np.asarray(centre) + np.asarray([0.0, 0.0, dx * 4])))

    source = HardSource(
        node_idx=jnp.asarray(desc.flat_index(src_loc), dtype=jnp.int32),
        signal=impulse_signal(steps, 1.0))
    receiver = NodeReceiver(
        node_idx=jnp.asarray(desc.flat_index(rcv_loc), dtype=jnp.int32))

    body = make_box_body(mesh.structure, mesh.box_spec, source, receiver)
    init = initial_box_carry(mesh.structure, mesh.box_spec, receiver)

    @jax.jit
    def forward():
        carry, outputs = jax.lax.scan(body, init, jnp.arange(steps))
        return outputs[-1] + 0.0 * carry[0][8, 8, 8]

    dt, _ = _time_scalar_fn(forward)
    fwd_updates = num_nodes * steps / dt

    # backward: value_and_grad w.r.t. the material filter coefficients
    # through a checkpointed scan (BASELINE: backward stencil throughput)
    bwd_steps = steps // 4 if platform != "cpu" else steps
    grad_body_src = HardSource(
        node_idx=source.node_idx, signal=impulse_signal(bwd_steps, 1.0))

    def loss(coef_b):
        import dataclasses as dc
        structure = dc.replace(mesh.structure, coef_b=coef_b)
        body = make_box_body(structure, mesh.box_spec, grad_body_src,
                             receiver, kernel_inject=False)
        init = initial_box_carry(structure, mesh.box_spec, receiver)

        seg = max(1, bwd_steps // 8)

        @jax.checkpoint
        def segment(carry, t0):
            return jax.lax.scan(lambda c, i: body(c, t0 + i), carry,
                                jnp.arange(seg))

        carry, outputs = jax.lax.scan(
            segment, init, jnp.arange(-(-bwd_steps // seg)) * seg)
        return jnp.sum(outputs ** 2)

    gfn = jax.jit(jax.grad(loss))

    @jax.jit
    def fwdbwd():
        return jnp.sum(gfn(mesh.structure.coef_b))

    dt_b, _ = _time_scalar_fn(fwdbwd, reps=2)
    bwd_updates = num_nodes * bwd_steps / dt_b
    return fwd_updates, bwd_updates


def main():
    platform = detect_platform()
    fwd, bwd = bench_waveguide(platform)
    sol = HBM_BW[platform] / BYTES_PER_NODE
    print(json.dumps({
        "metric": "waveguide_node_updates_per_s_per_chip",
        "value": fwd,
        "unit": "updates/s",
        "vs_baseline": fwd / sol,
        "extra": {
            "backward_node_updates_per_s_per_chip": bwd,
            "backward_vs_forward": bwd / fwd,
            "platform": platform,
            "speed_of_light_updates_per_s": sol,
        },
    }))


if __name__ == "__main__":
    main()
