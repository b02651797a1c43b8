"""W4 kernel conversion-cost probe: DMA floor vs i32-domain vs i8-domain
nibble extraction.  Decode shape (Llama-8B FFN): [64, 4096] x [4096, 14336].

Run ON the TPU under `timeout`."""

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
            xi = a[0] + (acc[0] * 1e-30).astype(a[0].dtype)
            out = fn(xi, *a[1:])
            return acc + out.reshape(-1)[:1].astype(jnp.float32) * 1e-9

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((1,), jnp.float32))

    np.asarray(jax.device_get(loop(*args)))
    t0 = time.time()
    np.asarray(jax.device_get(loop(*args)))
    return (time.time() - t0) / ITERS


def run(name, body, BK, BN, inputs, n_x=2, with_s=True):
    Mp = M
    specs = [
        pl.BlockSpec((Mp, BK // 2), lambda n, k: (0, k), memory_space=pltpu.VMEM)
    ] * n_x + [
        pl.BlockSpec((BK // 2, BN), lambda n, k: (k, n), memory_space=pltpu.VMEM)
    ]
    if with_s:
        specs.append(
            pl.BlockSpec((BK // g, BN), lambda n, k: (k, n), memory_space=pltpu.VMEM)
        )
    call = lambda *a: pl.pallas_call(
        body,
        grid=(N // BN, K // BK),
        in_specs=specs,
        out_specs=pl.BlockSpec((Mp, BN), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Mp, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*a)
    try:
        dt = timeit(call, *inputs)
        gbs = (K * N / 2) / dt / 1e9
        print(f"{name:28s} BK={BK} BN={BN}: {dt*1e6:8.1f} us  {gbs:7.1f} GB/s wt", flush=True)
    except Exception as e:
        print(f"{name:28s} BK={BK} BN={BN}: FAIL {str(e)[:120]}", flush=True)


def main():
    key = jax.random.key(0)
    x = jax.random.normal(key, (M, K // 2), jnp.bfloat16)
    x2 = jax.random.normal(jax.random.fold_in(key, 9), (M, K // 2), jnp.bfloat16)
    qw = (
        jax.random.randint(jax.random.fold_in(key, 1), (K // 2, N), 0, 255, jnp.int32)
        .astype(jnp.uint8)
    )
    s = jax.random.uniform(jax.random.fold_in(key, 2), (K // g, N), jnp.float32)

    for BK, BN in ((2048, 512), (2048, 1024), (4096, 512)):
        if K % BK or N % BN:
            continue
        G_blk = BK // g
        gh = g // 2

        # ---- A: DMA floor (touch qw via one cheap op, single dot) ----
        def kA(x_ref, x2_ref, qw_ref, o_ref, acc):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            p8 = qw_ref[...].bitcast(jnp.int8) if hasattr(qw_ref[...], "bitcast") else qw_ref[...].view(jnp.int8)
            acc[...] += jnp.dot(
                x_ref[...], p8.astype(jnp.bfloat16), preferred_element_type=jnp.float32
            )

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        # ---- B: current i32-domain nibble path (kernel v3, no zp) ----
        def kB(x_ref, x2_ref, qw_ref, s_ref, o_ref, acc):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            p = qw_ref[...].astype(jnp.int32)
            sb = s_ref[...].astype(jnp.bfloat16).reshape(G_blk, 1, BN)
            lo = (p & 0xF).astype(jnp.bfloat16).reshape(G_blk, gh, BN)
            hi = ((p >> 4) & 0xF).astype(jnp.bfloat16).reshape(G_blk, gh, BN)
            wlo = (lo * sb).reshape(BK // 2, BN)
            whi = (hi * sb).reshape(BK // 2, BN)
            a = jnp.dot(x_ref[...], wlo, preferred_element_type=jnp.float32)
            a += jnp.dot(x2_ref[...], whi, preferred_element_type=jnp.float32)
            acc[...] += a

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        # ---- C: i8-domain extraction (mask in int8, arithmetic hi) ----
        def kC(x_ref, x2_ref, qw_ref, s_ref, o_ref, acc):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            p8 = jax.lax.bitcast_convert_type(qw_ref[...], jnp.int8)
            lo8 = p8 & jnp.int8(0xF)
            p_bf = p8.astype(jnp.bfloat16)  # signed byte value
            lo_bf = lo8.astype(jnp.bfloat16)
            h = (p_bf - lo_bf) * jnp.bfloat16(1.0 / 16.0)
            hi_bf = jnp.where(h < 0, h + jnp.bfloat16(16.0), h)
            sb = s_ref[...].astype(jnp.bfloat16).reshape(G_blk, 1, BN)
            wlo = (lo_bf.reshape(G_blk, gh, BN) * sb).reshape(BK // 2, BN)
            whi = (hi_bf.reshape(G_blk, gh, BN) * sb).reshape(BK // 2, BN)
            a = jnp.dot(x_ref[...], wlo, preferred_element_type=jnp.float32)
            a += jnp.dot(x2_ref[...], whi, preferred_element_type=jnp.float32)
            acc[...] += a

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        # ---- D: i8-domain, scales deferred to per-group partial sums ----
        def kD(x_ref, x2_ref, qw_ref, s_ref, o_ref, acc):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            p8 = jax.lax.bitcast_convert_type(qw_ref[...], jnp.int8)
            lo8 = p8 & jnp.int8(0xF)
            p_bf = p8.astype(jnp.bfloat16)
            lo_bf = lo8.astype(jnp.bfloat16)
            h = (p_bf - lo_bf) * jnp.bfloat16(1.0 / 16.0)
            hi_bf = jnp.where(h < 0, h + jnp.bfloat16(16.0), h)
            # one fused [M, BK] x [BK, BN] dot via concatenated planes
            w = jnp.concatenate([lo_bf, hi_bf], axis=0)
            sb = s_ref[...].astype(jnp.bfloat16)
            sb2 = jnp.concatenate(
                [
                    jnp.repeat(sb, gh, axis=0),
                    jnp.repeat(sb, gh, axis=0),
                ],
                axis=0,
            )
            xw = jnp.concatenate([x_ref[...], x2_ref[...]], axis=1)
            a = jnp.dot(xw, w * sb2, preferred_element_type=jnp.float32)
            acc[...] += a

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        run(f"A dma+convert floor", kA, BK, BN, (x, x2, qw), with_s=False)
        run(f"B i32 nibbles (current)", kB, BK, BN, (x, x2, qw, s))
        run(f"C i8 nibbles", kC, BK, BN, (x, x2, qw, s))
        run(f"D i8 nibbles fused dot", kD, BK, BN, (x, x2, qw, s))


if __name__ == "__main__":
    main()
