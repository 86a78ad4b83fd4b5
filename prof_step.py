import time, numpy as np, jax, jax.numpy as jnp
from wayverb_tpu.core.geometry import Box
from wayverb_tpu.waveguide import run as wgrun
from wayverb_tpu.waveguide.descriptor import grid_spacing
from wayverb_tpu.waveguide.stencil_pallas import interior_step_pallas
from wayverb_tpu.waveguide.box_boundary import (apply_regions,
    initial_region_states)

side = (224, 224, 256)
fs = 3333.33
dx = grid_spacing(340.0, 1.0 / fs)
box = Box((0,0,0), (dx*(side[0]-4), dx*(side[1]-4), dx*(side[2]-4)))
mesh = wgrun.shoebox_mesh(box, np.full((1,8),0.1), dx, fs)
dims = mesh.descriptor.dimensions
print("dims", dims, "nodes", np.prod(dims)/1e6, "M")
s = mesh.structure
regions = tuple(mesh.regions)
order = s.filter_order

cur = jnp.zeros(dims); prev = jnp.zeros(dims)
states = initial_region_states(list(regions), order)

def timeit(name, fn, *args):
    f = jax.jit(fn)
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter(); R = 20
    for _ in range(R):
        o = jax.block_until_ready(f(*args))
    dt = (time.perf_counter()-t0)/R
    n = np.prod(dims)
    print(f"{name:30s} {dt*1e3:8.3f} ms  {n/dt/1e9:7.2f} Gnode/s  {n*12/dt/819e9*100:5.1f}% SoL")
    return dt

def steps_scan(body, carry, n=20):
    def f(c):
        return jax.lax.scan(lambda c,_: (body(c), None), c, None, length=n)[0]
    return f

# 1. interior pallas alone (scan of 20 steps to amortize dispatch)
def b1(c):
    cur, prev = c
    nxt = interior_step_pallas(cur, prev, s.interior_mask)
    return (nxt, cur)
f1 = steps_scan(b1, 0)
g = jax.jit(lambda c,p: jax.lax.scan(lambda cc,_: (b1(cc), None), (c,p), None, length=20)[0])
o = jax.block_until_ready(g(cur, prev))
t0=time.perf_counter(); R=5
for _ in range(R): o = jax.block_until_ready(g(cur,prev))
dt=(time.perf_counter()-t0)/R/20
n=np.prod(dims)
print(f"{'interior pallas':30s} {dt*1e3:8.3f} ms  {n/dt/1e9:7.2f} Gnode/s  {n*12/dt/819e9*100:5.1f}% SoL")

# 2. + isfinite
def b2(c):
    cur, prev, ok = c
    nxt = interior_step_pallas(cur, prev, s.interior_mask)
    ok = ok & jnp.all(jnp.isfinite(nxt))
    return (nxt, cur, ok)
g2 = jax.jit(lambda c,p: jax.lax.scan(lambda cc,_: (b2(cc), None), (c,p,jnp.asarray(True)), None, length=20)[0])
o = jax.block_until_ready(g2(cur, prev))
t0=time.perf_counter()
for _ in range(R): o = jax.block_until_ready(g2(cur,prev))
dt=(time.perf_counter()-t0)/R/20
print(f"{'interior + isfinite':30s} {dt*1e3:8.3f} ms  {n/dt/1e9:7.2f} Gnode/s  {n*12/dt/819e9*100:5.1f}% SoL")

# 3. + regions
def b3(c):
    cur, prev, st = c
    nxt = interior_step_pallas(cur, prev, s.interior_mask)
    nxt, st = apply_regions(nxt, cur, prev, st, list(regions), s.coef_b, s.coef_a)
    return (nxt, cur, st)
g3 = jax.jit(lambda c,p,st: jax.lax.scan(lambda cc,_: (b3(cc), None), (c,p,st), None, length=20)[0])
o = jax.block_until_ready(g3(cur, prev, states))
t0=time.perf_counter()
for _ in range(R): o = jax.block_until_ready(g3(cur,prev,states))
dt=(time.perf_counter()-t0)/R/20
print(f"{'interior + regions':30s} {dt*1e3:8.3f} ms  {n/dt/1e9:7.2f} Gnode/s  {n*12/dt/819e9*100:5.1f}% SoL")
