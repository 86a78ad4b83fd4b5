"""Ad-hoc parity check: mega kernel (interpret) vs fused box path, CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from wayverb_tpu.core.environment import Environment
from wayverb_tpu.core.geometry import Box, box_scene
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.box_mega import run_waveguide_box_mega
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.receivers import make_directional_receiver
from wayverb_tpu.waveguide.sources import (HardSource, impulse_signal,
                                           rectilinear_calibration_factor)

ENV = Environment()
FS = 3333.33
DX = grid_spacing(ENV.speed_of_sound, 1.0 / FS)


def main():
    box = Box((0, 0, 0), (1.4, 1.6, 1.8))
    mesh = wgrun.compute_mesh(box_scene(box), np.full((1, 8), 0.12), DX, FS,
                              scene_box=box, align=(8, 8, 128))
    desc = mesh.descriptor
    print("dims", desc.dimensions)
    steps = 24
    src_loc = mesh.require_inside((0.7, 0.8, 0.5))
    rcv_loc = mesh.require_inside((0.7, 0.8, 1.3))
    amplitude = rectilinear_calibration_factor(desc.spacing,
                                               ENV.acoustic_impedance)
    source = HardSource(
        node_idx=jnp.asarray(desc.flat_index(src_loc), dtype=jnp.int32),
        signal=impulse_signal(steps, amplitude))
    fs = desc.sample_rate(ENV.speed_of_sound)
    receiver = make_directional_receiver(desc, fs, ENV.ambient_density,
                                         desc.position(rcv_loc))

    ref = wgrun.run_waveguide_box(mesh.structure, mesh.box_spec, source,
                                  receiver, steps)
    mega = run_waveguide_box_mega(mesh.structure, mesh.box_spec, source,
                                  receiver, steps, chunk=8, interpret=True)
    for name, a, b in [("intensity", ref["outputs"][0],
                        mega["outputs"][0]),
                       ("pressure", ref["outputs"][1],
                        mega["outputs"][1])]:
        a, b = np.asarray(a), np.asarray(b)
        err = np.max(np.abs(a - b))
        scale = np.max(np.abs(a)) + 1e-30
        print(name, "max abs", scale, "max err", err, "rel", err / scale)
    print("stable", bool(ref["stable"]), bool(mega["stable"]))


if __name__ == "__main__":
    main()
