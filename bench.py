"""Benchmark: waveguide fwd/bwd node-updates/s, rays/s, weak scaling.

Prints ONE JSON line:
  {"metric": "waveguide_node_updates_per_s_per_chip", "value": N,
   "unit": "updates/s", "vs_baseline": N,
   "waveguide_fwd": N, "waveguide_bwd": N, "rays_per_s": N,
   "weak_scaling_eff": N, "errors": {...}, "extra": {...}}

Every section runs under its own try/except: one failing section records an
``errors[section]`` string instead of killing the whole bench (round 2's
backward OOM produced rc=1 and NO numbers — never again).

``vs_baseline`` is the forward waveguide throughput vs the HBM
speed-of-light estimate for the stencil (the reference publishes no
throughput numbers — BASELINE.md — so roofline fraction is the honest
denominator): 3 × 4 B per node update (read current + previous, write next;
neighbour reads hit the rolling VMEM window) against chip HBM bandwidth.

Timing methodology: on the axon-tunnelled TPU, ``block_until_ready`` does
NOT reliably block and fresh computations pay a ~100 s remote compile, so
every timed function is a single jit that ends in a scalar, forced with
``float()`` (a device→host transfer of a computed scalar is the only
dependable sync).  Long scans (1000 steps) amortize the ~30 ms per-call
tunnel latency to <3 %.
"""

import json
import os
import subprocess
import sys
import time
import traceback

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
    """Compile+warm once, then time ``reps`` forced executions and keep
    the BEST (the axon tunnel adds multi-ms scheduling noise per call;
    min-of-reps is the standard way to measure the program, not the
    tunnel — the weak-scaling harness already does the same)."""
    v = float(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        v = float(fn())
        best = min(best, time.perf_counter() - t0)
    return best, v


def bench_waveguide_forward(platform):
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
        steps = 1024

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

    from wayverb_tpu.waveguide.box_mega import (mega_supported,
                                                run_waveguide_box_mega)
    extra = {}
    use_mega = mega_supported(mesh.box_spec, source, receiver)
    if use_mega:
        # flagship: VMEM-resident multi-step mega-kernel — the field
        # ping-pong + carried boundary planes + IIR state live in VMEM
        # for 128 steps per pallas_call (HBM ~4 fields per chunk);
        # ~5.7e10 upd/s at this shape on v5e (MEGA_NOTES.md r5)
        def forward():
            out = run_waveguide_box_mega(
                mesh.structure, mesh.box_spec, source, receiver, steps,
                chunk=128)
            return float(jnp.sum(out["outputs"]))

        dt, _ = _time_scalar_fn(forward)

    body = make_box_body(mesh.structure, mesh.box_spec, source, receiver)
    init = initial_box_carry(mesh.structure, mesh.box_spec, receiver)

    @jax.jit
    def fwd():
        # unroll=4 lets XLA alias the (next, current) ping-pong buffers
        carry, outputs = jax.lax.scan(body, init, jnp.arange(steps),
                                      unroll=4)
        return outputs[-1] + 0.0 * carry[0][8, 8, 8]

    dt_stream, _ = _time_scalar_fn(lambda: float(fwd()))
    extra["streaming_fwd_updates_per_s"] = num_nodes * steps / dt_stream
    if not use_mega:
        dt = dt_stream
    ctx = dict(mesh=mesh, source=source, receiver=receiver,
               num_nodes=num_nodes, steps=steps, mega=use_mega,
               fwd_extra=extra)
    return num_nodes * steps / dt, ctx


def bench_waveguide_mega(platform):
    """The VMEM-resident multi-step mega-kernel, fwd + adjoint.

    The kernel is exact (oracle-tested) and its hand-built adjoint is
    another in-place leapfrog (the wave operator is self-adjoint; no
    forward rematerialization).  Forward numbers are measured by
    bench_waveguide_forward at the flagship 224x224x256; this section
    measures the full fwd+bwd pipeline and reports the SAME-shape
    fwd/bwd ratio so the quotient is not mixed-shape (VERDICT r4)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    from wayverb_tpu.core.geometry import Box
    from wayverb_tpu.waveguide import run as wgrun
    from wayverb_tpu.waveguide.box_mega import (mega_canonical_loss_fn,
                                                mega_supported,
                                                run_waveguide_box_mega)
    from wayverb_tpu.waveguide.descriptor import grid_spacing
    from wayverb_tpu.waveguide.receivers import NodeReceiver
    from wayverb_tpu.waveguide.sources import HardSource, impulse_signal

    # r5: the per-plane zero-primal pullbacks + XLA θ-grad phase fit the
    # full adjoint pipeline at the flagship shape (MEGA_NOTES.md)
    side = (224, 224, 256)
    steps = 1024
    fs = 3333.33
    dx = grid_spacing(340.0, 1.0 / fs)
    box = Box((0, 0, 0), (dx * (side[0] - 4), dx * (side[1] - 4),
                          dx * (side[2] - 4)))
    mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), dx, fs)
    desc = mesh.descriptor
    n = desc.num_nodes
    centre = tuple(np.asarray(box.centre()))
    src_loc = mesh.require_inside(centre)
    rcv_loc = mesh.require_inside(
        tuple(np.asarray(centre) + np.asarray([0.0, 0.0, dx * 4])))
    source = HardSource(
        node_idx=jnp.asarray(desc.flat_index(src_loc), dtype=jnp.int32),
        signal=impulse_signal(steps, 1.0))
    receiver = NodeReceiver(
        node_idx=jnp.asarray(desc.flat_index(rcv_loc), dtype=jnp.int32))
    if not mega_supported(mesh.box_spec, source, receiver):
        raise RuntimeError("mega path unsupported here")

    def forward():
        out = run_waveguide_box_mega(mesh.structure, mesh.box_spec,
                                     source, receiver, steps, chunk=128)
        return float(jnp.sum(out["outputs"]))

    dt_f, _ = _time_scalar_fn(forward)

    bwd_steps = 640
    grad_src = HardSource(node_idx=source.node_idx,
                          signal=impulse_signal(bwd_steps, 1.0))
    f = mega_canonical_loss_fn(mesh.structure, mesh.box_spec, grad_src,
                               receiver, bwd_steps, chunk=128)
    face_idx = np.asarray(mesh.box_spec.face_surface)

    def loss(coef_b):
        taps, _ = f(coef_b[face_idx],
                    jnp.asarray(mesh.structure.coef_a)[face_idx],
                    grad_src.signal)
        return jnp.sum(taps ** 2)

    gfn = jax.jit(lambda cb: jnp.sum(jax.grad(loss)(cb)))
    dt_b, _ = _time_scalar_fn(lambda: float(gfn(mesh.structure.coef_b)),
                              reps=2)
    return {
        "mega_fwd_updates_per_s": n * steps / dt_f,
        "mega_fwdbwd_updates_per_s": n * bwd_steps / dt_b,
        "mega_bwd_vs_fwd": (n * bwd_steps / dt_b) / (n * steps / dt_f),
        "mega_shape": list(side),
    }


def bench_waveguide_backward(platform, ctx):
    """value_and_grad w.r.t. material filter coefficients (BASELINE:
    backward stencil throughput).

    On the mega path the adjoint is the hand-built chunk-level VJP: the
    backward wave recursion is another VMEM-resident leapfrog (the wave
    operator is self-adjoint), so a full forward+backward costs ~2 kernel
    passes per step — no forward rematerialization at all.  The CPU /
    fallback path keeps the r3 checkpointed scan."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    from wayverb_tpu.waveguide.box_fused import (initial_box_carry,
                                                 make_box_body)
    from wayverb_tpu.waveguide.sources import HardSource, impulse_signal

    mesh, receiver = ctx["mesh"], ctx["receiver"]
    steps = ctx["steps"]
    bwd_steps = steps // 4 if platform != "cpu" else steps
    grad_src = HardSource(
        node_idx=ctx["source"].node_idx,
        signal=impulse_signal(bwd_steps, 1.0))

    def loss(coef_b):
        structure = dc.replace(mesh.structure, coef_b=coef_b)
        body = make_box_body(structure, mesh.box_spec, grad_src, receiver)
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
    return ctx["num_nodes"] * bwd_steps / dt_b


def bench_general(platform, ctx):
    """General-mesh (weight-code + compact boundary) solver throughput at
    the SAME shape as the box headline (VERDICT r4 #3a: absent numbers
    hide the deficit).  The run uses the box geometry through the GENERAL
    code path (run_waveguide), so the ratio to the box rate is geometry-
    matched.  Honest state (r5): the XLA scatter of the compact boundary
    pressures dominates (~2.5 ms/step for 321k nodes at 224³, measured
    against ~0.5 ms gathers and a ~0.4 ms dense pass) — the in-kernel
    boundary layout redesign is tracked in waveguide/GENERAL_NOTES.md."""
    import jax
    import jax.numpy as jnp
    from wayverb_tpu.waveguide import run as wgrun

    mesh, source, receiver = ctx["mesh"], ctx["source"], ctx["receiver"]
    steps = 100 if platform != "cpu" else 10
    import dataclasses as dc
    src = dc.replace(source, signal=source.signal[:steps])

    @jax.jit
    def fwd():
        out = wgrun.run_waveguide(mesh.structure,
                                  mesh.descriptor.dimensions, src,
                                  receiver, steps)
        return jnp.sum(out["outputs"] ** 2)

    dt, _ = _time_scalar_fn(lambda: float(fwd()), reps=2)
    return ctx["num_nodes"] * steps / dt


def bench_rays(platform):
    """Stochastic tracer throughput (ray·bounces/s) on a procedural hall."""
    import jax
    import jax.numpy as jnp
    from wayverb_tpu.core.surfaces import Surface
    from wayverb_tpu.raytracer.tracer import trace
    from wayverb_tpu.raytracer.scenes import procedural_hall

    from wayverb_tpu.raytracer.accel import build_ray_grid
    from wayverb_tpu.raytracer.mt_pallas import (build_pallas_triangles,
                                                 use_pallas)

    num_rays = 1 << 16 if platform != "cpu" else 1 << 12
    depth = 40 if platform != "cpu" else 8
    soup, n_tris = procedural_hall()
    grid = build_ray_grid(soup)
    surfaces = Surface(
        absorption=jnp.full((1, 8), 0.1),
        scattering=jnp.full((1, 8), 0.1))
    source = (2.0, 1.7, 3.0)
    rcv = (6.0, 1.9, 9.0)
    key = jax.random.PRNGKey(7)

    def make_run(accel):
        @jax.jit
        def run():
            res = trace(soup, surfaces, source, rcv, key,
                        num_rays=num_rays, depth=depth, max_time=1.0,
                        accel=accel)
            return jnp.sum(res.histogram)
        return run

    detail = {"hall_triangles": n_tris}
    dts = []
    if use_pallas():
        # the TPU fast path: VMEM-tiled Möller–Trumbore Pallas kernel
        dt_mt, total = _time_scalar_fn(
            make_run(build_pallas_triangles(soup)), reps=2)
        if not np.isfinite(total) or total <= 0:
            raise RuntimeError(f"MT-pallas trace deposited no energy "
                               f"({total})")
        detail["rays_per_s_mt_pallas"] = num_rays * depth / dt_mt
        dts.append(dt_mt)
    dt, total = _time_scalar_fn(make_run(grid), reps=2)
    if not np.isfinite(total) or total <= 0:
        raise RuntimeError(f"hall trace deposited no energy ({total})")
    dts.append(dt)
    detail["rays_per_s_voxel_dda"] = num_rays * depth / dt
    dt_dense, _ = _time_scalar_fn(make_run(None), reps=2)
    dts.append(dt_dense)
    detail["rays_per_s_dense"] = num_rays * depth / dt_dense
    return num_rays * depth / min(dts), detail


def bench_rays_large(platform):
    """rays/s on a ~9e4-triangle hall: the Morton-tile culling stage must
    keep throughput within a few x of the 5.4k-triangle rate (VERDICT r3
    missing #6; reference answer: voxel walk, cl/voxel.cpp:197-258)."""
    import jax
    import jax.numpy as jnp
    from wayverb_tpu.core.surfaces import Surface
    from wayverb_tpu.raytracer.mt_pallas import build_pallas_triangles
    from wayverb_tpu.raytracer.scenes import (procedural_hall_large,
                                              procedural_hall)
    from wayverb_tpu.raytracer.tracer import trace

    num_rays = 1 << 16 if platform != "cpu" else 1 << 10
    depth = 40 if platform != "cpu" else 4
    soup, n_tris = procedural_hall_large() if platform != "cpu" else \
        procedural_hall_large(shell_div=30, n_columns=6)
    surfaces = Surface(absorption=jnp.full((1, 8), 0.1),
                       scattering=jnp.full((1, 8), 0.1))
    key = jax.random.PRNGKey(11)
    accel = build_pallas_triangles(soup)   # auto-culled above CULL_MIN_TRIS (8192)

    @jax.jit
    def run():
        res = trace(soup, surfaces, (2.0, 1.7, 3.0), (6.0, 1.9, 9.0),
                    key, num_rays=num_rays, depth=depth, max_time=1.0,
                    accel=accel)
        return jnp.sum(res.histogram)

    dt, total = _time_scalar_fn(run, reps=2)
    if not np.isfinite(total) or total <= 0:
        raise RuntimeError(f"large-hall trace deposited no energy "
                           f"({total})")
    return num_rays * depth / dt, {"large_hall_triangles": n_tris,
                                   "culled": bool(accel.culled)}


def bench_weak_scaling():
    """Sharded-waveguide weak-scaling efficiency on virtual CPU devices.

    Runs tools/bench/weak_scaling.py in subprocesses (the host process owns
    the TPU platform; the sweep needs JAX_PLATFORMS=cpu with N forced host
    devices).  Efficiency = T(1 shard) / T(8 shards) at constant per-shard
    mesh size — ICI halo-exchange overhead is the quantity of interest;
    real multi-chip hardware is unavailable (one tunnelled v5e chip).
    """
    here = os.path.dirname(os.path.abspath(__file__))
    out = subprocess.run(
        [sys.executable, os.path.join(here, "tools", "bench",
                                      "weak_scaling.py")],
        capture_output=True, text=True, timeout=1500,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    if out.returncode != 0:
        raise RuntimeError(f"weak_scaling.py rc={out.returncode}: "
                           f"{out.stderr[-500:]}")
    data = json.loads(out.stdout.strip().splitlines()[-1])
    return data["efficiency"], data


def main():
    # persistent compilation cache: the mega-kernel's Mosaic compile runs
    # ~an hour on this 2-core host — pay it once, not per bench run
    import jax
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    metrics = {}
    errors = {}
    extra = {}

    try:
        platform = detect_platform()
    except Exception:
        platform = "cpu"
        errors["platform"] = traceback.format_exc(limit=2)
    extra["platform"] = platform
    sol = HBM_BW[platform] / BYTES_PER_NODE
    extra["speed_of_light_updates_per_s"] = sol

    ctx = None
    try:
        fwd, ctx = bench_waveguide_forward(platform)
        metrics["waveguide_fwd"] = fwd
        extra.update(ctx.get("fwd_extra", {}))
    except Exception:
        errors["waveguide_fwd"] = traceback.format_exc(limit=4)

    if ctx is not None:
        try:
            metrics["waveguide_bwd"] = bench_waveguide_backward(platform,
                                                                ctx)
        except Exception:
            errors["waveguide_bwd"] = traceback.format_exc(limit=4)

    if ctx is not None:
        try:
            gen = bench_general(platform, ctx)
            extra["general_fwd_updates_per_s"] = gen
            if metrics.get("waveguide_fwd"):
                extra["general_vs_box_fwd"] = gen / metrics["waveguide_fwd"]
        except Exception:
            errors["general_fwd"] = traceback.format_exc(limit=4)

    if platform != "cpu":
        try:
            mega = bench_waveguide_mega(platform)
            extra.update(mega)
            # the mega adjoint (no forward remat) beats the checkpointed
            # scan — report the better backward
            if mega["mega_fwdbwd_updates_per_s"] > metrics.get(
                    "waveguide_bwd", 0.0):
                metrics["waveguide_bwd"] = mega["mega_fwdbwd_updates_per_s"]
        except Exception:
            errors["mega"] = traceback.format_exc(limit=4)

    try:
        rays, ray_detail = bench_rays(platform)
        metrics["rays_per_s"] = rays
        extra.update(ray_detail)
    except Exception:
        errors["rays_per_s"] = traceback.format_exc(limit=4)

    try:
        large, ldetail = bench_rays_large(platform)
        extra["rays_per_s_large"] = large
        extra.update(ldetail)
    except Exception:
        errors["rays_per_s_large"] = traceback.format_exc(limit=4)

    try:
        eff, detail = bench_weak_scaling()
        # THREE distinctly-named figures (VERDICT r4 asked for honest
        # naming): raw virtual-CPU wall-clock, the ctrl-normalized
        # collective efficiency (2-core host ceiling divided out), and
        # the auditable ICI projection for the overlapped schedule
        metrics["weak_scaling_eff_raw_cpu_harness"] = eff
        metrics["weak_scaling_eff_vs_ctrl"] = detail.get(
            "efficiency_vs_ctrl", eff)
        proj = (detail.get("wire_per_step", {})
                .get("ici_projection_224_8shards", {}))
        stream = proj.get("streaming_rate_serialized_link", {})
        metrics["weak_scaling_ici_projection"] = stream.get(
            "efficiency_with_overlap")
        extra["weak_scaling"] = detail
        # legacy headline slot: keep the vs_ctrl figure (same metric as
        # BENCH_r04's weak_scaling_eff) so round-over-round comparison
        # stays apples-to-apples
        metrics["weak_scaling_eff"] = metrics["weak_scaling_eff_vs_ctrl"]
    except Exception:
        errors["weak_scaling_eff"] = traceback.format_exc(limit=4)

    fwd = metrics.get("waveguide_fwd", 0.0)
    bwd = metrics.get("waveguide_bwd")
    if fwd and bwd:
        extra["backward_vs_forward"] = bwd / fwd
    print(json.dumps({
        "metric": "waveguide_node_updates_per_s_per_chip",
        "value": fwd,
        "unit": "updates/s",
        "vs_baseline": fwd / sol,
        "waveguide_fwd": metrics.get("waveguide_fwd"),
        "waveguide_bwd": metrics.get("waveguide_bwd"),
        "rays_per_s": metrics.get("rays_per_s"),
        "weak_scaling_eff": metrics.get("weak_scaling_eff"),
        "weak_scaling_eff_raw_cpu_harness": metrics.get(
            "weak_scaling_eff_raw_cpu_harness"),
        "weak_scaling_eff_vs_ctrl": metrics.get("weak_scaling_eff_vs_ctrl"),
        "weak_scaling_ici_projection": metrics.get(
            "weak_scaling_ici_projection"),
        "errors": errors,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
