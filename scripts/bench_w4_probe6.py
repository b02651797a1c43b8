"""W4 probe 6 = probe 4 re-run under the CALIBRATED harness
(probe_util.timeit — round-2/3 probes 3-5 measured the ~28 ms tunnel
round trip, not the kernels).  Also prints roofline references.

Run ON the TPU under `timeout`.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def report(name, dt, nbytes):
    print(f"{name:40s}: {dt*1e6:9.1f} us  {nbytes/dt/1e9:7.1f} GB/s", flush=True)


def run(name, body, BK, BN, inputs, n_x=2, with_s=True):
    specs = [
        pl.BlockSpec((M, BK // 2), lambda n, k: (0, k), memory_space=pltpu.VMEM)
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
        out_specs=pl.BlockSpec((M, BN), lambda n, k: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*a)
    try:
        dt = timeit(call, *inputs)
        report(f"{name} BK={BK} BN={BN}", dt, WBYTES)
    except Exception as e:
        print(f"{name:40s}: FAIL {str(e)[:140]}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    print(f"tunnel fixed overhead: {fixed_overhead()*1e3:.2f} ms", flush=True)
    key = jax.random.key(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    xh = jax.random.normal(key, (M, K // 2), jnp.bfloat16)
    x2h = jax.random.normal(jax.random.fold_in(key, 9), (M, K // 2), jnp.bfloat16)
    xq = (xh * 16).astype(jnp.int8)
    x2q = (x2h * 16).astype(jnp.int8)
    qw = (
        jax.random.randint(jax.random.fold_in(key, 1), (K // 2, N), 0, 255, jnp.int32)
        .astype(jnp.uint8)
    )
    w_bf = jax.random.normal(jax.random.fold_in(key, 2), (K, N), jnp.bfloat16)
    w_f8 = w_bf.astype(jnp.float8_e4m3fn)
    s = jax.random.uniform(jax.random.fold_in(key, 3), (K // g, N), jnp.float32)

    dt = timeit(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32), x, w_bf)
    report("XLA bf16 dot (4x bytes)", dt, K * N * 2)
    dt = timeit(
        lambda x, w: jnp.dot(x, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32),
        x, w_f8,
    )
    report("XLA fp8->bf16 dot (2x bytes)", dt, K * N)
    dt = timeit(
        lambda x, q: jnp.dot(x, q.astype(jnp.bfloat16), preferred_element_type=jnp.float32),
        xh, qw,
    )
    report("XLA u8->bf16 dot (W4 bytes)", dt, WBYTES)

    # DMA-only floor
    def kNull(x_ref, qw_ref, o_ref):
        o_ref[...] = x_ref[:, :128].astype(jnp.bfloat16)

    def call_null(xx, qq):
        return pl.pallas_call(
            kNull,
            grid=(N // 1024, (K // 2) // 1024),
            in_specs=[
                pl.BlockSpec((M, 128), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1024, 1024), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, 128), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.bfloat16),
        )(xx, qq)

    dt = timeit(call_null, xh, qw)
    report("pallas DMA-only u8 (1024,1024)", dt, WBYTES)

    for BK, BN in ((2048, 1024), (4096, 1024)):
        G_blk = BK // g

        def kB(x_ref, x2_ref, qw_ref, s_ref, o_ref, acc, G_blk=G_blk, BK=BK, BN=BN):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            p = qw_ref[...].astype(jnp.int32)
            sb = s_ref[...].astype(jnp.bfloat16).reshape(G_blk, 1, BN)
            lo = (p & 0xF).astype(jnp.bfloat16).reshape(G_blk, gh, BN)
            hi = ((p >> 4) & 0xF).astype(jnp.bfloat16).reshape(G_blk, gh, BN)
            a = jnp.dot(x_ref[...], (lo * sb).reshape(BK // 2, BN),
                        preferred_element_type=jnp.float32)
            a += jnp.dot(x2_ref[...], (hi * sb).reshape(BK // 2, BN),
                         preferred_element_type=jnp.float32)
            acc[...] += a

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        def kG(x_ref, x2_ref, qw_ref, s_ref, o_ref, acc, G_blk=G_blk, BK=BK, BN=BN):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)

            p8 = jax.lax.bitcast_convert_type(qw_ref[...], jnp.int8)
            lo_bf = (p8 & jnp.int8(0x0F)).astype(jnp.bfloat16)
            hi_bf = (p8 & jnp.int8(-16)).astype(jnp.bfloat16)
            sb = s_ref[...].astype(jnp.bfloat16).reshape(G_blk, 1, BN)
            sh = (s_ref[...] * (1.0 / 16.0)).astype(jnp.bfloat16).reshape(G_blk, 1, BN)
            a = jnp.dot(x_ref[...], (lo_bf.reshape(G_blk, gh, BN) * sb).reshape(BK // 2, BN),
                        preferred_element_type=jnp.float32)
            a += jnp.dot(x2_ref[...], (hi_bf.reshape(G_blk, gh, BN) * sh).reshape(BK // 2, BN),
                         preferred_element_type=jnp.float32)
            acc[...] += a

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        def kE(x_ref, x2_ref, qw_ref, s_ref, o_ref, acc, G_blk=G_blk, BK=BK, BN=BN):
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
                a += (dlo.astype(jnp.float32)
                      + dhi.astype(jnp.float32) * (1.0 / 16.0)) * s_ref[G, :][None, :]
            acc[...] += a

            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        run("B i32 nibbles (current)", kB, BK, BN, (xh, x2h, qw, s))
        run("G xor8 i8->bf16 prescale", kG, BK, BN, (xh, x2h, qw, s))
        run("E xor8 int8-MXU group dots", kE, BK, BN, (xq, x2q, qw, s))


if __name__ == "__main__" and not os.environ.get("W4_FULL"):
    main()


def bench_full_kernels():
    """Calibrated timing of the PRODUCTION matmul entry points (incl. the
    zero-point epilogue + plane splits) at the decode shape."""
    from sglang_npu_tpu.layers.quantization import quantize_params_w4, dequant
    from sglang_npu_tpu.ops.pallas.quant_matmul import (
        matmul_w4, matmul_w4a8, matmul_w4a16x2,
    )

    key = jax.random.key(1)
    w = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.05
    qw = quantize_params_w4({"layers": {"wq": w}}, group_size=g)["layers"]["wq"]
    x = jax.random.normal(jax.random.fold_in(key, 2), (M, K), jnp.bfloat16)
    ref = np.asarray(jnp.asarray(x, jnp.float32) @ dequant(qw, jnp.float32))
    for name, fn in (("matmul_w4 (bf16 A16)", matmul_w4),
                     ("matmul_w4a16x2 (int8x2 A16)", matmul_w4a16x2),
                     ("matmul_w4a8 (int8 A8)", matmul_w4a8)):
        got = np.asarray(fn(x, qw.q, qw.s, qw.b, group_size=g)).astype(np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        dt = timeit(lambda xx, q, s, b: fn(xx, q, s, b, group_size=g),
                    x, qw.q, qw.s, qw.b)
        report(f"{name} err={err:.4f}", dt, WBYTES)


if __name__ == "__main__" and os.environ.get("W4_FULL"):
    bench_full_kernels()
