#!/usr/bin/env python
"""Offline visualisation: wavefront slices and traced ray paths.

The reference GUI renders the live waveguide pressure field and ray paths
in its 3D scene view; this tool renders the same data to PNGs (the
presentation layer of a headless framework).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="viz")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--rays", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    import jax
    import jax.numpy as jnp

    from wayverb_tpu.core.geometry import Box, box_scene
    from wayverb_tpu.core.surfaces import Surface
    from wayverb_tpu.raytracer import tracer
    from wayverb_tpu.utils.events import iter_pressure_fields
    from wayverb_tpu.waveguide import run as wgrun
    from wayverb_tpu.waveguide.descriptor import grid_spacing
    from wayverb_tpu.waveguide.receivers import NodeReceiver
    from wayverb_tpu.waveguide.sources import HardSource, impulse_signal

    os.makedirs(args.out_dir, exist_ok=True)
    box = Box((0, 0, 0), (4.0, 3.0, 3.2))
    src, rcv = (1.2, 1.5, 1.6), (2.8, 1.5, 1.6)

    # wavefront frames: slice through the source plane
    fs = 3333.33
    dx = grid_spacing(340.0, 1.0 / fs)
    mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), dx, fs)
    desc = mesh.descriptor
    sloc = mesh.require_inside(src)
    rloc = mesh.require_inside(rcv)
    steps = args.frames * 6
    source = HardSource(node_idx=jnp.asarray(desc.flat_index(sloc),
                                             jnp.int32),
                        signal=impulse_signal(steps, 1.0))
    receiver = NodeReceiver(node_idx=jnp.asarray(desc.flat_index(rloc),
                                                 jnp.int32))
    z_slice = int(sloc[2])
    for step, field, _ in iter_pressure_fields(mesh, source, receiver,
                                               steps, every=6):
        plane = np.asarray(field[:, :, z_slice]).T
        plt.figure(figsize=(5, 4))
        limit = max(np.abs(plane).max(), 1e-6)
        plt.imshow(plane, origin="lower", cmap="RdBu",
                   vmin=-limit, vmax=limit)
        plt.title(f"pressure, step {step}")
        plt.colorbar()
        path = os.path.join(args.out_dir, f"wavefront_{step:04d}.png")
        plt.savefig(path, dpi=100)
        plt.close()
        print("wrote", path)

    # ray paths
    soup = box_scene(box)
    surf = Surface(absorption=jnp.full((1, 8), 0.1),
                   scattering=jnp.full((1, 8), 0.1))
    res = tracer.trace(soup, surf, src, rcv, jax.random.PRNGKey(0),
                       num_rays=args.rays, depth=6, max_time=0.5,
                       capture_positions=True)
    pos = np.asarray(res.positions)              # (depth, R, 3)
    plt.figure(figsize=(6, 4.5))
    for r in range(pos.shape[1]):
        xs = np.concatenate([[src[0]], pos[:, r, 0]])
        ys = np.concatenate([[src[1]], pos[:, r, 1]])
        plt.plot(xs, ys, alpha=0.4, lw=0.8)
    plt.scatter(*src[:2], c="g", label="source", zorder=5)
    plt.scatter(*rcv[:2], c="r", label="receiver", zorder=5)
    plt.xlim(0, box.max_corner[0])
    plt.ylim(0, box.max_corner[1])
    plt.legend()
    plt.title("traced ray paths (top view)")
    path = os.path.join(args.out_dir, "ray_paths.png")
    plt.savefig(path, dpi=110)
    plt.close()
    print("wrote", path)


if __name__ == "__main__":
    main()
