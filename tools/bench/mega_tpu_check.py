"""TPU check: mega-kernel parity vs fused path + throughput at bench shape."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.box_mega import run_waveguide_box_mega
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.receivers import NodeReceiver
from wayverb_tpu.waveguide.sources import HardSource, impulse_signal

ENV = Environment()
FS = 3333.33
DX = grid_spacing(ENV.speed_of_sound, 1.0 / FS)


def build(side, steps):
    box = Box((0, 0, 0), (DX * (side[0] - 4), DX * (side[1] - 4),
                          DX * (side[2] - 4)))
    mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), DX, FS)
    desc = mesh.descriptor
    print("dims", desc.dimensions, flush=True)
    centre = tuple(np.asarray(box.centre()))
    src_loc = mesh.require_inside(centre)
    rcv_loc = mesh.require_inside(
        tuple(np.asarray(centre) + np.asarray([0.0, 0.0, DX * 4])))
    source = HardSource(
        node_idx=jnp.asarray(desc.flat_index(src_loc), dtype=jnp.int32),
        signal=impulse_signal(steps, 1.0))
    receiver = NodeReceiver(
        node_idx=jnp.asarray(desc.flat_index(rcv_loc), dtype=jnp.int32))
    return mesh, source, receiver


def main():
    print(jax.devices(), flush=True)
    # correctness at a small TPU-runnable shape
    mesh, source, receiver = build((64, 64, 128), 96)
    t0 = time.perf_counter()
    ref = wgrun.run_waveguide_box(mesh.structure, mesh.box_spec, source,
                                  receiver, 96)
    p_ref = np.asarray(ref["outputs"][1] if isinstance(ref["outputs"],
                                                       tuple)
                       else ref["outputs"])
    print("fused done", time.perf_counter() - t0, flush=True)
    t0 = time.perf_counter()
    mega = run_waveguide_box_mega(mesh.structure, mesh.box_spec, source,
                                  receiver, 96, chunk=32)
    p_mega = np.asarray(mega["outputs"])
    print("mega done", time.perf_counter() - t0, flush=True)
    err = np.max(np.abs(p_ref - p_mega))
    print("parity: max |ref|", np.max(np.abs(p_ref)), "err", err,
          "stable", bool(mega["stable"]), flush=True)

    # throughput at bench shape
    side = (224, 224, 256)
    steps = 1024
    mesh, source, receiver = build(side, steps)
    n = int(np.prod(mesh.descriptor.dimensions))
    t0 = time.perf_counter()
    out = run_waveguide_box_mega(mesh.structure, mesh.box_spec, source,
                                 receiver, steps, chunk=64)
    _ = np.asarray(out["outputs"])
    print("compile+run1", time.perf_counter() - t0, flush=True)
    t0 = time.perf_counter()
    out = run_waveguide_box_mega(mesh.structure, mesh.box_spec, source,
                                 receiver, steps, chunk=64)
    _ = np.asarray(out["outputs"])
    dt = time.perf_counter() - t0
    print("us/step", dt / steps * 1e6, "updates/s", n * steps / dt,
          "vs HBM SoL", n * steps / dt / 6.825e10,
          "stable", bool(out["stable"]), flush=True)


if __name__ == "__main__":
    main()
