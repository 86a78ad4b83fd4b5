import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

dims = (224, 224, 256)
X, Y, Z = dims
XT = 8
nb = X // XT
NSTEP = 1000
key = jax.random.PRNGKey(0)
cur0 = jax.random.normal(key, dims, jnp.float32) * 1e-3
prev0 = jax.random.normal(key, dims, jnp.float32) * 1e-3
LAM = 1.0 / 3.0
ilo = (2, 2, 2); ihi = (219, 219, 251)
blo = tuple(v - 1 for v in ilo); bhi = tuple(v + 1 for v in ihi)
planes0 = [jnp.zeros((Y, Z), jnp.float32), jnp.zeros((Y, Z), jnp.float32),
           jnp.zeros((X, Z), jnp.float32), jnp.zeros((X, Z), jnp.float32),
           jnp.zeros((X, Y), jnp.float32), jnp.zeros((X, Y), jnp.float32)]

def timeit(name, call, nout=1):
    @jax.jit
    def f(cur, prev):
        def b(c, _):
            cur, prev = c
            o = call(cur, prev)
            nxt = o[0] if isinstance(o, (tuple, list)) else o
            return (nxt, cur), ()
        c, _ = jax.lax.scan(b, (cur, prev), None, length=NSTEP)
        return c[0][8, 8, 8]
    v = float(f(cur0, prev0))
    t0 = time.perf_counter()
    for _ in range(3):
        v = float(f(cur0, prev0))
    dt = (time.perf_counter() - t0) / 3 / NSTEP
    print(f"{name}: {dt*1e3:.3f} ms/step", flush=True)

blk = lambda im: pl.BlockSpec((XT, Y, Z), im, memory_space=pltpu.VMEM)
full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
jm3 = lambda i: (jnp.maximum(i - 1, 0), 0, 0)
jm2 = lambda i: (jnp.maximum(i - 1, 0), 0)

def make(mode):
    def kern(a_ref, b_ref, pxlo, pxhi, pylo, pyhi, pzlo, pzhi,
             o_ref, ixlo, ixhi, iylo, iyhi, izlo, izhi, slab, tail):
        i = pl.program_id(0)
        j = jnp.maximum(i - 1, 0)
        @pl.when(i >= 1)
        def _():
            c = slab[...]
            up = jnp.concatenate([tail[...], c[:-1]], axis=0)
            dn = jnp.concatenate([c[1:], a_ref[0:1]], axis=0)
            zy = jnp.zeros_like(c[:, :1])
            acc = up + dn
            acc = acc + jnp.concatenate([zy, c[:, :-1]], axis=1)
            acc = acc + jnp.concatenate([c[:, 1:], zy], axis=1)
            zz = jnp.zeros_like(c[:, :, :1])
            acc = acc + jnp.concatenate([zz, c[:, :, :-1]], axis=2)
            acc = acc + jnp.concatenate([c[:, :, 1:], zz], axis=2)
            res = LAM * acc - b_ref[...]
            if mode >= 1:  # mask
                gxr = j * XT + jax.lax.broadcasted_iota(jnp.int32, (XT, 1, 1), 0)
                xm = (gxr >= ilo[0]) & (gxr <= ihi[0])
                iy = jax.lax.broadcasted_iota(jnp.int32, (1, Y, 1), 1)
                iz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Z), 2)
                m = xm & (iy >= ilo[1]) & (iy <= ihi[1]) & (iz >= ilo[2]) & (iz <= ihi[2])
                res = jnp.where(m, res, 0.0)
            if mode >= 2:  # z splices
                iz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Z), 2)
                row = pl.multiple_of(j * XT, XT)
                res = jnp.where(iz == blo[2], pzlo[pl.ds(row, XT), :][:, :, None], res)
                res = jnp.where(iz == bhi[2], pzhi[pl.ds(row, XT), :][:, :, None], res)
            o_ref[...] = res
            if mode >= 3:  # y row stores
                row = pl.multiple_of(j * XT, XT)
                o_ref[:, blo[1], :] = pylo[pl.ds(row, XT), :]
                o_ref[:, bhi[1], :] = pyhi[pl.ds(row, XT), :]
            if mode >= 4:  # x cond stores
                @pl.when(blo[0] // XT == j)
                def _():
                    o_ref[blo[0] % XT] = pxlo[...]
                @pl.when(bhi[0] // XT == j)
                def _():
                    o_ref[bhi[0] % XT] = pxhi[...]
            if mode >= 5:  # extractions
                iylo[...] = o_ref[:, ilo[1], :]
                iyhi[...] = o_ref[:, ihi[1], :]
                izlo[...] = o_ref[:, :, ilo[2]]
                izhi[...] = o_ref[:, :, ihi[2]]
                @pl.when(ilo[0] // XT == j)
                def _():
                    ixlo[...] = o_ref[ilo[0] % XT]
                @pl.when(ihi[0] // XT == j)
                def _():
                    ixhi[...] = o_ref[ihi[0] % XT]
        tail[...] = slab[XT-1:XT]
        slab[...] = a_ref[...]

    def call(cur, prev):
        out = pl.pallas_call(kern, grid=(nb + 1,),
            in_specs=[blk(lambda i: (jnp.minimum(i, nb - 1), 0, 0)),
                      blk(jm3)] + [full()] * 6,
            out_specs=(blk(jm3), full(), full(),
                       pl.BlockSpec((XT, Z), jm2, memory_space=pltpu.VMEM),
                       pl.BlockSpec((XT, Z), jm2, memory_space=pltpu.VMEM),
                       pl.BlockSpec((XT, Y), jm2, memory_space=pltpu.VMEM),
                       pl.BlockSpec((XT, Y), jm2, memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct(dims, jnp.float32),
                       jax.ShapeDtypeStruct((Y, Z), jnp.float32),
                       jax.ShapeDtypeStruct((Y, Z), jnp.float32),
                       jax.ShapeDtypeStruct((X, Z), jnp.float32),
                       jax.ShapeDtypeStruct((X, Z), jnp.float32),
                       jax.ShapeDtypeStruct((X, Y), jnp.float32),
                       jax.ShapeDtypeStruct((X, Y), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((XT, Y, Z), jnp.float32),
                            pltpu.VMEM((1, Y, Z), jnp.float32)])(cur, prev, *planes0)
        return out
    return call

for m, name in [(0, "stencil+7outs    "), (1, "+mask            "),
                (2, "+z wheres        "), (3, "+y row stores    "),
                (4, "+x cond stores   "), (5, "+extractions     ")]:
    timeit(name, make(m))
