"""Probe: VMEM-resident multi-step leapfrog feasibility on the real chip.

Question for the round-4 mega-kernel design: can the whole pressure field
ping-pong (2 x (X, Y, Z) f32 buffers) live in VMEM across K time steps per
pallas_call, and what updates/s does the in-VMEM stencil sustain when HBM
traffic is amortized to ~(4 fields / K steps)?

Run on TPU:  python tools/bench/probe_vmem_resident.py
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
    """dst[:] = C2 * neighbor_sum(src) - dst[:], slab by slab."""
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


def _kernel(cur_ref, prev_ref, cur_out, prev_out, *, X, Y, Z, K):
    # K sub-steps; 2 per fori iteration so buffer roles stay static
    def two(i, _):
        _substep(prev_ref, cur_ref, X, Y, Z)   # prev <- next(t)
        _substep(cur_ref, prev_ref, X, Y, Z)   # cur  <- next(t+1)
        return 0

    jax.lax.fori_loop(0, K // 2, two, 0)
    cur_out[...] = cur_ref[...]
    prev_out[...] = prev_ref[...]


def make_run(X, Y, Z, K, limit_mb=128):
    kern = functools.partial(_kernel, X=X, Y=Y, Z=Z, K=K)
    call = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((X, Y, Z), jnp.float32),
                   jax.ShapeDtypeStruct((X, Y, Z), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
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
    for (X, Y, Z) in [(128, 224, 256), (160, 224, 256), (192, 224, 256),
                      (224, 224, 256)]:
        for K in (16, 64):
            mb = 2 * X * Y * Z * 4 / 1e6
            key = f"{X}x{Y}x{Z}_K{K}"
            try:
                run = make_run(X, Y, Z, K)
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
                                "err": str(e)[-300:]}
                print(key, "FAIL", str(e)[-300:], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
