"""Locate the w4 kernel bottleneck: time stripped-down kernel variants."""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 64, 4096, 14336
g = 128
ITERS = 50


def timeit(fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            xi = a[0] + (acc * 1e-30).astype(a[0].dtype)
            out = fn(xi, *a[1:])
            return acc + out.reshape(-1)[:1].astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((1,), jnp.float32))

    np.asarray(jax.device_get(loop(*args)))
    t0 = time.time()
    np.asarray(jax.device_get(loop(*args)))
    return (time.time() - t0) / ITERS


def make_kernel(body, BK, BN, Mp, n_x=1, x_cols=None, extra_specs=()):
    x_cols = x_cols or BK // 2

    def call(*args):
        return pl.pallas_call(
            body,
            grid=(N // BN, K // BK),
            in_specs=[
                pl.BlockSpec((Mp, x_cols), lambda n, k: (0, k), memory_space=pltpu.VMEM)
            ] * n_x
            + [
                pl.BlockSpec((BK // 2, BN), lambda n, k: (k, n), memory_space=pltpu.VMEM)
            ]
            + list(extra_specs),
            out_specs=pl.BlockSpec((Mp, BN), lambda n, k: (0, n), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((Mp, BN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(*args)

    return call


def main():
    key = jax.random.key(0)
    Mp = M
    x = jax.random.normal(key, (Mp, K // 2), jnp.bfloat16)
    qw = jax.random.randint(jax.random.fold_in(key, 1), (K // 2, N), 0, 255, jnp.int32).astype(jnp.uint8)
    s = jax.random.uniform(jax.random.fold_in(key, 2), (K // g, N), jnp.float32)

    for BK, BN in ((2048, 512), (1024, 1024), (2048, 1024)):
        G_blk = BK // g
        gh = g // 2

        # A: DMA only — touch qw trivially (sum rows 0) no convert
        def kA(x_ref, qw_ref, o_ref, acc):
            k = pl.program_id(1)
            @pl.when(k == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)
            acc[...] += jnp.dot(x_ref[...], x_ref[...].T[: , :BN] if False else jnp.zeros((BK//2, BN), jnp.bfloat16), preferred_element_type=jnp.float32) + qw_ref[0, 0].astype(jnp.float32)
            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        # B: convert+dot, no scales (single nibble plane)
        def kB(x_ref, qw_ref, o_ref, acc):
            k = pl.program_id(1)
            @pl.when(k == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)
            p = qw_ref[...].astype(jnp.int32)
            lo = (p & 0xF).astype(jnp.bfloat16)
            acc[...] += jnp.dot(x_ref[...], lo, preferred_element_type=jnp.float32)
            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        # C: both nibbles, two dots, no scales
        def kC(x_ref, qw_ref, o_ref, acc):
            k = pl.program_id(1)
            @pl.when(k == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)
            p = qw_ref[...].astype(jnp.int32)
            lo = (p & 0xF).astype(jnp.bfloat16)
            hi = ((p >> 4) & 0xF).astype(jnp.bfloat16)
            a = jnp.dot(x_ref[...], lo, preferred_element_type=jnp.float32)
            a += jnp.dot(x_ref[...], hi, preferred_element_type=jnp.float32)
            acc[...] += a
            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        # D: full (nibbles + group scales)
        def kD(x_ref, qw_ref, s_ref, o_ref, acc):
            k = pl.program_id(1)
            @pl.when(k == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)
            p = qw_ref[...].astype(jnp.int32)
            sb = s_ref[...].astype(jnp.bfloat16).reshape(G_blk, 1, BN)
            lo = ((p & 0xF).astype(jnp.bfloat16).reshape(G_blk, gh, BN) * sb).reshape(BK // 2, BN)
            hi = (((p >> 4) & 0xF).astype(jnp.bfloat16).reshape(G_blk, gh, BN) * sb).reshape(BK // 2, BN)
            a = jnp.dot(x_ref[...], lo, preferred_element_type=jnp.float32)
            a += jnp.dot(x_ref[...], hi, preferred_element_type=jnp.float32)
            acc[...] += a
            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        s_spec = pl.BlockSpec((BK // g, BN), lambda n, k: (k, n), memory_space=pltpu.VMEM)
        for name, kern, args, extra in (
            ("A dma-only  ", kA, (x, qw), ()),
            ("B 1nib dot  ", kB, (x, qw), ()),
            ("C 2nib dots ", kC, (x, qw), ()),
            ("D full+scale", kD, (x, qw, s), (s_spec,)),
        ):
            try:
                call = make_kernel(kern, BK, BN, Mp, extra_specs=extra)
                dt = timeit(call, *args)
                print(f"BK={BK} BN={BN} {name}: {dt*1e6:8.1f} us", flush=True)
            except Exception as e:
                print(f"BK={BK} BN={BN} {name}: FAIL {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
