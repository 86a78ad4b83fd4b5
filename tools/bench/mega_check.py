"""On-hardware mega-kernel correctness artifact (VERDICT r4 #5).

The CPU test suite exercises the mega kernel only in interpret mode at
toy shapes; this tool runs the REAL Mosaic kernels on the chip at a
production shape and records:

 * forward parity: mega (VMEM-resident multi-step) vs the streaming
   fused path, relative max-abs-err over a 128-step directional-receiver
   run at 224x224x256;
 * gradient check: central finite differences THROUGH THE MEGA PATH
   ITSELF on three face filter coefficients at the same shape (the
   chunk-level custom VJP vs the solver it differentiates).

Writes MEGA_CHECK_r05.json at the repo root; tests/test_artifacts.py
pins the recorded errors against the stated bounds.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax                                                   # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp                                      # noqa: E402

from wayverb_tpu.core.environment import Environment         # noqa: E402
from wayverb_tpu.core.geometry import Box                    # noqa: E402
from wayverb_tpu.waveguide import run as wgrun               # noqa: E402
from wayverb_tpu.waveguide.box_mega import (                 # noqa: E402
    mega_canonical_loss_fn, run_waveguide_box_mega)
from wayverb_tpu.waveguide.descriptor import grid_spacing    # noqa: E402
from wayverb_tpu.waveguide.receivers import (                # noqa: E402
    NodeReceiver, make_directional_receiver)
from wayverb_tpu.waveguide.sources import (                  # noqa: E402
    HardSource, impulse_signal, rectilinear_calibration_factor)

ENV = Environment()
FS = 3333.33
DX = grid_spacing(ENV.speed_of_sound, 1.0 / FS)
SIDE = (224, 224, 256)
STEPS = 128


def build():
    box = Box((0, 0, 0), tuple(DX * (s - 4) for s in SIDE))
    mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.12), DX, FS)
    desc = mesh.descriptor
    centre = tuple(np.asarray(box.centre()))
    src_loc = mesh.require_inside(centre)
    rcv_loc = mesh.require_inside(
        tuple(np.asarray(centre) + np.asarray([0.0, 0.0, DX * 8])))
    amp = rectilinear_calibration_factor(desc.spacing,
                                         ENV.acoustic_impedance)
    source = HardSource(
        node_idx=jnp.asarray(desc.flat_index(src_loc), dtype=jnp.int32),
        signal=impulse_signal(STEPS, amp))
    return mesh, desc, source, rcv_loc


def forward_parity(mesh, desc, source, rcv_loc):
    fs = desc.sample_rate(ENV.speed_of_sound)
    receiver = make_directional_receiver(desc, fs, ENV.ambient_density,
                                         desc.position(rcv_loc))
    ref = wgrun.run_waveguide_box(mesh.structure, mesh.box_spec, source,
                                  receiver, STEPS)
    mega = run_waveguide_box_mega(mesh.structure, mesh.box_spec, source,
                                  receiver, STEPS, chunk=64)
    errs = {}
    for name, a, b in (("intensity", ref["outputs"][0],
                        mega["outputs"][0]),
                       ("pressure", ref["outputs"][1],
                        mega["outputs"][1])):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = float(np.max(np.abs(a))) + 1e-30
        errs[name] = float(np.max(np.abs(a - b)) / scale)
    errs["stable"] = bool(mega["stable"]) and bool(ref["stable"])
    return errs


def grad_fd_check(mesh, desc, source, rcv_loc):
    # near-wall placement: at 224³ a centre source's wavefront never
    # reaches a boundary within the probe horizon (grads would be
    # vacuously zero); 10 nodes off the −z wall gives reflections by
    # step ~35
    steps = 64
    spec = mesh.box_spec
    loc = ((spec.ilo[0] + spec.ihi[0]) // 2,
           (spec.ilo[1] + spec.ihi[1]) // 2, spec.ilo[2] + 10)
    rloc = (loc[0], loc[1], loc[2] + 4)
    src = HardSource(
        node_idx=jnp.asarray(desc.flat_index(loc), dtype=jnp.int32),
        signal=impulse_signal(steps, 1.0))
    receiver = NodeReceiver(
        node_idx=jnp.asarray(desc.flat_index(rloc), dtype=jnp.int32))
    f = mega_canonical_loss_fn(mesh.structure, mesh.box_spec, src,
                               receiver, steps, chunk=64)
    face_idx = np.asarray(mesh.box_spec.face_surface)
    fa = jnp.asarray(mesh.structure.coef_a)[face_idx]

    def loss(cb):
        taps, _ = f(cb[face_idx], fa, src.signal)
        return jnp.sum(taps ** 2)

    cb0 = jnp.asarray(mesh.structure.coef_b)
    g = np.asarray(jax.jit(jax.grad(loss))(cb0))
    lf = jax.jit(loss)
    eps = 3e-3
    out = []
    # probe the largest-gradient coefficients (FD noise swamps tiny ones)
    flat = np.abs(g).reshape(-1)
    for j in np.argsort(flat)[::-1][:3]:
        ij = np.unravel_index(j, g.shape)
        e = np.zeros_like(g)
        e[ij] = eps
        fd = (float(lf(cb0 + e)) - float(lf(cb0 - e))) / (2 * eps)
        rel = abs(fd - g[ij]) / (abs(fd) + abs(g[ij]) + 1e-30)
        out.append({"coef": [int(v) for v in ij], "grad": float(g[ij]),
                    "fd": fd, "rel_err": float(rel)})
    return out


def main():
    mesh, desc, source, rcv_loc = build()
    parity = forward_parity(mesh, desc, source, rcv_loc)
    grads = grad_fd_check(mesh, desc, source, rcv_loc)
    result = {
        "platform": jax.devices()[0].device_kind,
        "shape": list(SIDE),
        "steps": STEPS,
        "forward_parity_rel_maxabs": parity,
        "grad_fd": grads,
        # the grad bound applies to the LARGEST-|grad| coefficient only:
        # f32 central differences cannot resolve the smaller ones (their
        # loss deltas sit below float32 resolution — recorded for
        # information); exact VJP parity at small shapes is pinned by
        # tests/test_box_mega.py::TestMegaGradients
        "bounds": {"forward_rel": 5e-4, "grad_rel_top": 5e-2},
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "MEGA_CHECK_r05.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
