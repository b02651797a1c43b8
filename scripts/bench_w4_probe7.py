"""Probe 7: int4-dtype weights in Mosaic (round-4 W4 rework).

Questions:
  1. Does an s4 array occupy 4 bits/elem in HBM (packed) on this backend?
  2. Can a Pallas kernel read an s4 Ref and `astype(int8)` it (hardware
     unpack), then feed full-depth int8 MXU dots?
  3. Does the MXU take the s4 operand directly (no astype)?
  4. Speed at the decode shape vs the DMA floor.

Run ON the TPU under `timeout`.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probe_util import fixed_overhead, timeit

M, K, N = 64, 4096, 14336
g = 128
WBYTES = K * N // 2


def report(name, dt, nbytes=WBYTES):
    print(f"{name:44s}: {dt*1e6:9.1f} us  {nbytes/dt/1e9:7.1f} GB/s", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    print(f"tunnel fixed overhead: {fixed_overhead()*1e3:.2f} ms", flush=True)
    dev = jax.devices()[0]

    # --- 1. HBM footprint of s4 ---
    try:
        before = dev.memory_stats()["bytes_in_use"]
        w4 = jax.device_put(
            jnp.zeros((K, N), jnp.int4)
        )
        w4.block_until_ready()
        after = dev.memory_stats()["bytes_in_use"]
        print(f"s4 [{K},{N}] HBM bytes: {after-before}  (packed={K*N//2}, "
              f"unpacked={K*N})", flush=True)
    except Exception as e:
        print("s4 footprint probe FAILED:", str(e)[:200], flush=True)

    key = jax.random.key(0)
    xq = jax.random.randint(key, (M, K), -127, 127, jnp.int32).astype(jnp.int8)
    q_host = np.random.default_rng(0).integers(-8, 8, size=(K, N), dtype=np.int8)
    w_s4 = jax.jit(lambda v: v.astype(jnp.int4))(jnp.asarray(q_host))
    w_s4.block_until_ready()
    s = jax.random.uniform(jax.random.fold_in(key, 3), (K // g, N), jnp.float32)

    ref = (np.asarray(xq, np.float32) @ (q_host.astype(np.float32)
           * np.repeat(np.asarray(s), g, axis=0)))

    BK, BN = 2048, 1024
    G_blk = BK // g

    def kernel(mode, xq_ref, w_ref, s_ref, o_ref, acc):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        if mode == "astype":
            w8 = w_ref[...].astype(jnp.int8)
        else:
            w8 = w_ref[...]
        a = jnp.zeros_like(acc[...])
        for G in range(G_blk):
            r0, r1 = G * g, (G + 1) * g
            d = jax.lax.dot_general(
                xq_ref[:, r0:r1], w8[r0:r1],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            a += d.astype(jnp.float32) * s_ref[G, :][None, :]
        acc[...] += a

        @pl.when(k == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc[...].astype(jnp.float32)

    def build(mode):
        return lambda xx, ww, ss: pl.pallas_call(
            functools.partial(kernel, mode),
            grid=(N // BN, K // BK),
            in_specs=[
                pl.BlockSpec((M, BK), lambda n, k: (0, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((BK, BN), lambda n, k: (k, n), memory_space=pltpu.VMEM),
                pl.BlockSpec((BK // g, BN), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, BN), lambda n, k: (0, n), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(xx, ww, ss)

    for mode in ("astype", "direct"):
        try:
            fn = build(mode)
            got = np.asarray(fn(xq, w_s4, s))
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            dt = timeit(fn, xq, w_s4, s)
            report(f"s4 {mode} group-dots err={err:.5f}", dt)
        except Exception as e:
            print(f"s4 {mode}: FAIL {str(e)[:200]}", flush=True)

    # full-depth dot (no groups) — the MXU ceiling for this shape
    def kfull(mode, xq_ref, w_ref, o_ref, acc):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        w8 = w_ref[...].astype(jnp.int8) if mode == "astype" else w_ref[...]
        acc[...] += jax.lax.dot_general(
            xq_ref[...], w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)

        @pl.when(k == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc[...]

    for mode in ("astype", "direct"):
        try:
            fn = lambda xx, ww: pl.pallas_call(
                functools.partial(kfull, mode),
                grid=(N // BN, K // BK),
                in_specs=[
                    pl.BlockSpec((M, BK), lambda n, k: (0, k), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BK, BN), lambda n, k: (k, n), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((M, BN), lambda n, k: (0, n), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                ),
            )(xx, ww)
            np.asarray(fn(xq, w_s4))  # compile/run
            dt = timeit(fn, xq, w_s4)
            report(f"s4 {mode} FULL-depth dot (no scales)", dt)
        except Exception as e:
            print(f"s4 full {mode}: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
