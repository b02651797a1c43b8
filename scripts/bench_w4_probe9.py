"""Probe 9: W4 kernel-core variants under the i32-dot constraint (probe8:
f32-preferred int8 dots and s4 bitcasts both crash Mosaic on this stack).

Exploits dhi = 16*(x . (q_hi-8)) being EXACTLY divisible by 16, so
`dhi >> 4` replaces a f32 convert+mul per plane; the a16x2 combine
(d1 << 7) + d2 is likewise exact in i32 (|d1| < 2^18).

Run ON the TPU under `timeout`.
"""

import functools
import os
import sys

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
gh = g // 2
WBYTES = K * N // 2


def report(name, dt, nbytes=WBYTES):
    print(f"{name:46s}: {dt*1e6:9.1f} us  {nbytes/dt/1e9:7.1f} GB/s", flush=True)


def run(name, body, inputs, in_specs, BN, nrows=M):
    call = lambda *a: pl.pallas_call(
        body,
        grid=(N // BN, K // 2048),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((M, BN), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*a)
    try:
        out = np.asarray(call(*inputs))
        dt = timeit(call, *inputs)
        report(name, dt)
        return out
    except Exception as e:
        print(f"{name:46s}: FAIL {str(e)[:160]}", flush=True)
        return None


def main():
    print("backend:", jax.default_backend(), flush=True)
    print(f"tunnel fixed overhead: {fixed_overhead()*1e3:.2f} ms", flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    xq = jnp.asarray(rng.integers(-127, 128, size=(M, K // 2)), jnp.int8)
    x2q = jnp.asarray(rng.integers(-127, 128, size=(M, K // 2)), jnp.int8)
    qw = jnp.asarray(rng.integers(0, 256, size=(K // 2, N)), jnp.uint8)
    s = jax.random.uniform(jax.random.fold_in(key, 3), (K // g, N), jnp.float32)
    xstk = jnp.concatenate([xq, x2q], axis=0)
    x2stk = jnp.concatenate([x2q, xq], axis=0)

    def specs(BN, nx=2, rows=M):
        xs = pl.BlockSpec((rows, 1024), lambda n, k: (0, k), memory_space=pltpu.VMEM)
        return [xs] * nx + [
            pl.BlockSpec((1024, BN), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, BN), lambda n, k: (k, n), memory_space=pltpu.VMEM),
        ]

    G_blk = 16  # 2048 / 128

    # ---------------- D2: a8 shift-combine ----------------
    def kD2(rows):
        def k_(x_ref, x2_ref, qw_ref, s_ref, o_ref, acc):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            p8 = jax.lax.bitcast_convert_type(qw_ref[...], jnp.int8)
            lo8 = p8 & jnp.int8(0x0F)
            hi8 = p8 & jnp.int8(-16)
            a = jnp.zeros_like(acc[...])
            for G in range(G_blk):
                r0, r1 = G * gh, (G + 1) * gh
                dlo = jnp.dot(x_ref[:, r0:r1], lo8[r0:r1],
                              preferred_element_type=jnp.int32)
                dhi = jnp.dot(x2_ref[:, r0:r1], hi8[r0:r1],
                              preferred_element_type=jnp.int32)
                d = dlo + jax.lax.shift_right_arithmetic(dhi, 4)
                if rows == 2 * M:
                    d = jax.lax.shift_left(d[:M], 7) + d[M:]
                a += d.astype(jnp.float32) * s_ref[G, :][None, :]
            acc[...] += a

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc[...]
        return k_

    outD2 = run("D2 a8 shift-combine BN=1024", kD2(M), (xq, x2q, qw, s),
                specs(1024), 1024)
    # reference check vs numpy
    lo = (np.asarray(qw).astype(np.int8) & 0x0F).astype(np.float32)
    hi = ((np.asarray(qw).astype(np.int8) & -16) // 16).astype(np.float32)
    sn = np.asarray(s)
    ref = np.zeros((M, N), np.float32)
    xl, xh = np.asarray(xq, np.float32), np.asarray(x2q, np.float32)
    for G in range(K // g):
        r0, r1 = G * gh, (G + 1) * gh
        ref += (xl[:, r0:r1] @ lo[r0:r1] + xh[:, r0:r1] @ hi[r0:r1]) * sn[G]
    if outD2 is not None:
        print(f"   D2 err vs ref: {np.abs(outD2-ref).max():.2e}", flush=True)

    run("D3 a8 shift-combine BN=2048", kD2(M), (xq, x2q, qw, s),
        specs(2048), 2048)

    # ---------------- X2: a16x2 shift-combine ----------------
    run("X2 x2 shift-combine BN=1024", kD2(2 * M), (xstk, x2stk, qw, s),
        specs(1024, rows=2 * M), 1024, nrows=2 * M)
    run("X3 x2 shift-combine BN=2048", kD2(2 * M), (xstk, x2stk, qw, s),
        specs(2048, rows=2 * M), 2048, nrows=2 * M)

    # ---------------- D4: batched dot_general over G ----------------
    def kD4(x_ref, x2_ref, qw_ref, s_ref, o_ref, acc):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        BN = acc.shape[1]
        p8 = jax.lax.bitcast_convert_type(qw_ref[...], jnp.int8)
        lo8 = (p8 & jnp.int8(0x0F)).reshape(G_blk, gh, BN)
        hi8 = (p8 & jnp.int8(-16)).reshape(G_blk, gh, BN)
        xg = x_ref[...].reshape(M, G_blk, gh).transpose(1, 0, 2)
        x2g = x2_ref[...].reshape(M, G_blk, gh).transpose(1, 0, 2)
        dlo = jax.lax.dot_general(
            xg, lo8, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # [G, M, BN]
        dhi = jax.lax.dot_general(
            x2g, hi8, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        d = dlo + jax.lax.shift_right_arithmetic(dhi, 4)
        a = jnp.sum(
            d.astype(jnp.float32) * s_ref[...].reshape(G_blk, 1, BN), axis=0
        )
        acc[...] += a

        @pl.when(k == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc[...]

    run("D4 a8 batched-G dots BN=1024", kD4, (xq, x2q, qw, s),
        specs(1024), 1024)

    # ---------------- DMA floor at this tiling ----------------
    def kNull(x_ref, qw_ref, o_ref):
        o_ref[...] = x_ref[:, :1024].astype(jnp.float32)

    call = lambda xx, qq: pl.pallas_call(
        kNull,
        grid=(N // 1024, (K // 2) // 1024),
        in_specs=[
            pl.BlockSpec((M, 1024), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1024, 1024), lambda n, k: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, 1024), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 1024), jnp.float32),
    )(xx, qq)
    dt = timeit(call, xq, qw)
    report("DMA-only floor (u8 1024x1024 tiles)", dt)


if __name__ == "__main__":
    main()
