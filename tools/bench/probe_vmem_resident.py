"""Probe: VMEM-resident multi-step leapfrog — fields in HBM refs, DMA'd
to VMEM scratch for K steps (the design that became box_mega.py).

Supersedes the round-4 probe A (VMEM-blockspec in/out), whose finding is
kept for the record: pallas allocates input AND output VMEM copies even
with input_output_aliases, so the 2-buffer ping-pong costs 4x field VMEM
and caps the shape at half the budget — HBM refs + explicit DMA is the
viable form.

Avoids the probe-A failure (pallas allocates input AND output VMEM copies
even with input_output_aliases, so 4x field VMEM): in/out live in ANY/HBM,
the kernel DMAs them into two VMEM scratch buffers, runs K leapfrog steps,
and DMAs back.  VMEM = 2 x field + slack.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C2 = 1.0 / 3.0


def _substep(dst, src, X, Y, Z, xt=8):
    nb = X // xt

    def slab(j, _):
        row = pl.multiple_of(j * xt, xt)
        c = src[pl.ds(row, xt)]
        up_row = jnp.where(j == 0, jnp.zeros((1, Y, Z), c.dtype),
                           src[pl.ds(jnp.maximum(row - 1, 0), 1)])
        dn_row = jnp.where(j == nb - 1, jnp.zeros((1, Y, Z), c.dtype),
                           src[pl.ds(jnp.minimum(row + xt, X - 1), 1)])
        up = jnp.concatenate([up_row, c[:-1]], axis=0)
        dn = jnp.concatenate([c[1:], dn_row], axis=0)
        zy = jnp.zeros_like(c[:, :1])
        acc = up + dn
        acc = acc + jnp.concatenate([zy, c[:, :-1]], axis=1)
        acc = acc + jnp.concatenate([c[:, 1:], zy], axis=1)
        zz = jnp.zeros_like(c[:, :, :1])
        acc = acc + jnp.concatenate([zz, c[:, :, :-1]], axis=2)
        acc = acc + jnp.concatenate([c[:, :, 1:], zz], axis=2)
        dst[pl.ds(row, xt)] = C2 * acc - dst[pl.ds(row, xt)]
        return 0

    jax.lax.fori_loop(0, nb, slab, 0)


def _kernel(cur_hbm, prev_hbm, cur_out, prev_out, a, b, sems,
            *, X, Y, Z, K):
    pltpu.make_async_copy(cur_hbm, a, sems.at[0]).start()
    pltpu.make_async_copy(prev_hbm, b, sems.at[1]).start()
    pltpu.make_async_copy(cur_hbm, a, sems.at[0]).wait()
    pltpu.make_async_copy(prev_hbm, b, sems.at[1]).wait()

    def two(i, _):
        _substep(b, a, X, Y, Z)
        _substep(a, b, X, Y, Z)
        return 0

    jax.lax.fori_loop(0, K // 2, two, 0)
    pltpu.make_async_copy(a, cur_out, sems.at[0]).start()
    pltpu.make_async_copy(b, prev_out, sems.at[1]).start()
    pltpu.make_async_copy(a, cur_out, sems.at[0]).wait()
    pltpu.make_async_copy(b, prev_out, sems.at[1]).wait()


def make_run(X, Y, Z, K, limit_mb=128):
    kern = functools.partial(_kernel, X=X, Y=Y, Z=Z, K=K)
    call = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((X, Y, Z), jnp.float32),
                   jax.ShapeDtypeStruct((X, Y, Z), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        scratch_shapes=[pltpu.VMEM((X, Y, Z), jnp.float32),
                        pltpu.VMEM((X, Y, Z), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=limit_mb * 1024 * 1024),
    )

    @functools.partial(jax.jit, static_argnames=("nchunks",))
    def run(cur, prev, nchunks):
        def body(c, _):
            return call(*c), 0.0
        (cur, prev), _ = jax.lax.scan(body, (cur, prev),
                                      jnp.arange(nchunks))
        return jnp.sum(cur[8, 8, :8])

    return run


def main():
    print(jax.devices())
    results = {}
    for (X, Y, Z, lim) in [(128, 224, 256, 128), (192, 224, 256, 128),
                           (224, 224, 256, 120), (224, 224, 256, 127)]:
        for K in (64,):
            mb = 2 * X * Y * Z * 4 / 1e6
            key = f"{X}x{Y}x{Z}_K{K}_lim{lim}"
            try:
                run = make_run(X, Y, Z, K, lim)
                cur = jnp.zeros((X, Y, Z), jnp.float32).at[X // 2, Y // 2,
                                                           Z // 2].set(1.0)
                prev = jnp.zeros((X, Y, Z), jnp.float32)
                nchunks = max(1, 512 // K)
                t0 = time.perf_counter()
                float(run(cur, prev, nchunks))
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(run(cur, prev, nchunks))
                dt = time.perf_counter() - t0
                steps = K * nchunks
                ups = X * Y * Z * steps / dt
                results[key] = {"ok": True, "buffers_mb": round(mb, 1),
                                "compile_s": round(compile_s, 1),
                                "us_per_step": round(dt / steps * 1e6, 1),
                                "updates_per_s": ups}
                print(key, results[key], flush=True)
            except Exception as e:  # noqa: BLE001
                results[key] = {"ok": False, "buffers_mb": round(mb, 1),
                                "err": str(e)[-200:]}
                print(key, "FAIL", str(e)[-200:], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
