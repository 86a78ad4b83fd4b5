import time, numpy as np, jax, jax.numpy as jnp
from wayverb_tpu.core.geometry import Box
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.box_boundary import (apply_regions,
    initial_region_states)
from wayverb_tpu.waveguide.stencil_pallas import interior_step_pallas

side = (224, 224, 256)
fs = 3333.33
dx = grid_spacing(340.0, 1.0 / fs)
box = Box((0,0,0), (dx*(side[0]-4), dx*(side[1]-4), dx*(side[2]-4)))
mesh = wgrun.shoebox_mesh(box, np.full((1,8),0.1), dx, fs)
dims = mesh.descriptor.dimensions
s = mesh.structure
regions = tuple(mesh.regions)
states = initial_region_states(list(regions), s.filter_order)
n = np.prod(dims)
key = jax.random.PRNGKey(0)
cur = jax.random.normal(key, dims)*0.01
prev = jax.random.normal(jax.random.fold_in(key,1), dims)*0.01

def timed(fn, *args):
    out = fn(*args)
    x = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter(); reps=3
    for _ in range(reps):
        out = fn(*args)
        x = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter()-t0)/reps

def report(name, body, carry):
    gs = {}
    for steps in (40, 140):
        gs[steps] = jax.jit(lambda c, steps=steps: jax.lax.scan(
            lambda cc,_: (body(cc), None), c, None, length=steps)[0])
    dt = (timed(gs[140], carry) - timed(gs[40], carry)) / 100.0
    print(f"{name:36s} {dt*1e3:7.3f} ms/step  {n/dt/1e9:6.2f} Gn/s  {n*12/dt/819e9*100:5.1f}% SoL")

def b_int(c):
    cur, prev = c
    return (interior_step_pallas(cur, prev, s.interior_mask), cur)
report("interior (old 3-slab w/ mask)", b_int, (cur, prev))

def b_full(c):
    cur, prev, st = c
    nxt = interior_step_pallas(cur, prev, s.interior_mask)
    nxt, st = apply_regions(nxt, cur, prev, st, list(regions), s.coef_b, s.coef_a)
    return (nxt, cur, st)
report("interior + regions", b_full, (cur, prev, states))

def b_full_fin(c):
    cur, prev, st, ok = c
    nxt = interior_step_pallas(cur, prev, s.interior_mask)
    nxt, st = apply_regions(nxt, cur, prev, st, list(regions), s.coef_b, s.coef_a)
    ok = ok & jnp.all(jnp.isfinite(nxt))
    return (nxt, cur, st, ok)
report("interior + regions + isfinite", b_full_fin, (cur, prev, states, jnp.asarray(True)))
