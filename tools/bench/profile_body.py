import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time
import numpy as np
import jax, jax.numpy as jnp
from wayverb_tpu.core.geometry import Box
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.box_fused import make_box_body, initial_box_carry, fused_step
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.receivers import NodeReceiver
from wayverb_tpu.waveguide.sources import HardSource, impulse_signal

NSTEP = 1000
side = (224, 224, 256)
fs = 3333.33
dx = grid_spacing(340.0, 1.0 / fs)
box = Box((0, 0, 0), (dx * (side[0] - 4), dx * (side[1] - 4), dx * (side[2] - 4)))
mesh = wgrun.shoebox_mesh(box, np.full((1, 8), 0.1), dx, fs)
desc = mesh.descriptor
print("dims", desc.dimensions, flush=True)
num_nodes = desc.num_nodes
centre = tuple(np.asarray(box.centre()))
src = mesh.require_inside(centre)
rcv = mesh.require_inside(tuple(np.asarray(centre) + np.asarray([0, 0, dx * 4])))
source = HardSource(node_idx=jnp.asarray(desc.flat_index(src), dtype=jnp.int32),
                    signal=impulse_signal(NSTEP, 1.0))
receiver = NodeReceiver(node_idx=jnp.asarray(desc.flat_index(rcv), dtype=jnp.int32))

body = make_box_body(mesh.structure, mesh.box_spec, source, receiver)
init = initial_box_carry(mesh.structure, mesh.box_spec, receiver)

@jax.jit
def run():
    carry, outputs = jax.lax.scan(body, init, jnp.arange(NSTEP))
    return outputs[-1] + 0.0 * carry[0][8, 8, 8]

v = float(run().sum())  # compile + run
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    v = float(run().sum())
dt = (time.perf_counter() - t0) / reps / NSTEP
ups = num_nodes / dt
sol = 819e9 / 12.0
print(f"full body: {dt*1e3:.3f} ms/step, {ups:.3e} updates/s, vs SoL {ups/sol:.3f}", flush=True)

# kernel only
cur = jax.random.normal(jax.random.PRNGKey(0), desc.dimensions, jnp.float32) * 1e-3
planes0 = tuple(jnp.zeros(mesh.box_spec.plane_shape(p), jnp.float32) for p in range(6))
geom = mesh.box_spec.geom_array()
@jax.jit
def kern(cur, prev):
    def b(c, _):
        cur, prev = c
        nxt, _ = fused_step(mesh.box_spec, geom, cur, prev, planes0)
        return (nxt, cur), ()
    c, _ = jax.lax.scan(b, (cur, prev), None, length=NSTEP)
    return c[0][8, 8, 8]
v = float(kern(cur, cur))
t0 = time.perf_counter()
for _ in range(reps):
    v = float(kern(cur, cur))
dt = (time.perf_counter() - t0) / reps / NSTEP
print(f"kernel only: {dt*1e3:.3f} ms/step ({num_nodes/dt/(sol):.3f} of SoL)", flush=True)


# plane step alone (carried-plane values, no field involvement)
from wayverb_tpu.waveguide.box_fused import plane_boundary_step_planes
spec = mesh.box_spec
face_idx = jnp.asarray(spec.face_surface, dtype=jnp.int32)
face_b = mesh.structure.coef_b[face_idx]
face_a = mesh.structure.coef_a[face_idx]
pl0 = tuple(jnp.zeros(spec.plane_shape(p), jnp.float32) for p in range(6))
st0 = spec.initial_states(mesh.structure.filter_order)

@jax.jit
def planes_only(pl6, in6, ppl6, st):
    def b(c, _):
        pl6, in6, ppl6, st = c
        pplus, st = plane_boundary_step_planes(pl6, in6, ppl6, st, spec, face_b, face_a)
        return (pplus, in6, pl6, st), ()
    c, _ = jax.lax.scan(b, (pl6, in6, ppl6, st), None, length=NSTEP)
    return c[0][0][3, 3]

v = float(planes_only(pl0, pl0, pl0, st0))
t0 = time.perf_counter()
for _ in range(reps):
    v = float(planes_only(pl0, pl0, pl0, st0))
dt = (time.perf_counter() - t0) / reps / NSTEP
print(f"plane step only: {dt*1e3:.3f} ms/step", flush=True)
