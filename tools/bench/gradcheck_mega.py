"""Ad-hoc gradient parity: mega custom VJP vs the fused box path (CPU)."""

import dataclasses as dc

import numpy as np
import jax
import jax.numpy as jnp

from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box, box_scene
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.box_mega import mega_canonical_loss_fn
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.receivers import NodeReceiver
from wayverb_tpu.waveguide.sources import (HardSource, SoftSource,
                                           impulse_signal)

ENV = Environment()
FS = 3333.33
DX = grid_spacing(ENV.speed_of_sound, 1.0 / FS)


def main():
    box = Box((0, 0, 0), (1.4, 1.6, 1.8))
    mesh = wgrun.compute_mesh(box_scene(box), np.full((1, 8), 0.12), DX,
                              FS, scene_box=box, align=(8, 8, 128))
    desc = mesh.descriptor
    steps = 20
    src_loc = mesh.require_inside((0.7, 0.8, 0.5))
    rcv_loc = mesh.require_inside((0.7, 0.8, 1.3))
    sig0 = impulse_signal(steps, 3.0)
    receiver = NodeReceiver(
        node_idx=jnp.asarray(desc.flat_index(rcv_loc), dtype=jnp.int32))
    spec = mesh.box_spec
    face_idx = np.asarray(spec.face_surface)

    for src_cls, name in [(HardSource, "hard"), (SoftSource, "soft")]:
        source = src_cls(
            node_idx=jnp.asarray(desc.flat_index(src_loc),
                                 dtype=jnp.int32),
            signal=sig0)
        f = mega_canonical_loss_fn(mesh.structure, spec, source, receiver,
                                   steps, chunk=4, interpret=True)

        def mega_loss(coef_b, coef_a, sig):
            taps, _ = f(coef_b[face_idx], coef_a[face_idx], sig)
            return jnp.sum(taps ** 2)

        def old_loss(coef_b, coef_a, sig):
            structure = dc.replace(mesh.structure, coef_b=coef_b,
                                   coef_a=coef_a)
            src = src_cls(node_idx=source.node_idx, signal=sig)
            out = wgrun.run_waveguide_box(structure, spec, src, receiver,
                                          steps, kernel_inject=False)
            return jnp.sum(out["outputs"] ** 2)

        args = (mesh.structure.coef_b, mesh.structure.coef_a, sig0)
        gm = jax.grad(mega_loss, argnums=(0, 1, 2))(*args)
        go = jax.grad(old_loss, argnums=(0, 1, 2))(*args)
        for lbl, a, b in zip(("coef_b", "coef_a", "sig"), gm, go):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.max(np.abs(b)) + 1e-30
            err = np.max(np.abs(a - b))
            print(f"{name} {lbl}: ref_scale {scale:.4e} err {err:.3e} "
                  f"rel {err / scale:.3e}")


if __name__ == "__main__":
    main()
