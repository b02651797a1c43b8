"""W4 probe 5: WHERE does the bandwidth go?  probe4 showed even a
bitcast+dot floor streams packed uint8 at only ~50 GB/s while the XLA
fp8 model path sustains ~400 GB/s.  Isolate: DMA pattern (strided block
vs block-major contiguous), dtype (uint8 vs int32 view vs bf16), and
pure-XLA reference dots.

Run ON the TPU under `timeout`.
"""

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


def report(name, dt, nbytes):
    print(f"{name:40s}: {dt*1e6:9.1f} us  {nbytes/dt/1e9:7.1f} GB/s", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.key(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    xh = jax.random.normal(key, (M, K // 2), jnp.bfloat16)
    qw = (
        jax.random.randint(jax.random.fold_in(key, 1), (K // 2, N), 0, 255, jnp.int32)
        .astype(jnp.uint8)
    )
    w_bf = jax.random.normal(jax.random.fold_in(key, 2), (K, N), jnp.bfloat16)
    WBYTES = K * N // 2

    # ---------- XLA reference: full bf16 dot (4x the bytes) ----------
    dt = timeit(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32), x, w_bf)
    report("XLA bf16 dot [64,4096]x[4096,14336]", dt, K * N * 2)

    # ---------- XLA: uint8 convert+dot (lets XLA pipeline it) ----------
    dt = timeit(
        lambda x, q: jnp.dot(
            x, q.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        ),
        xh,
        qw,
    )
    report("XLA u8->bf16 dot (same bytes as W4)", dt, WBYTES)

    # ---------- Pallas: DMA-only (never touch qw in compute) ----------
    def make_null(BKh, BN, dtype, ncols):
        def kNull(x_ref, qw_ref, o_ref):
            o_ref[...] = x_ref[:, :128].astype(jnp.float32)

        return lambda xx, qq: pl.pallas_call(
            kNull,
            grid=(ncols // BN, (K // 2) // BKh),
            in_specs=[
                pl.BlockSpec((M, 128), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BKh, BN), lambda n, k: (k, n), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, 128), lambda n, k: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        )(xx, qq)

    for BKh, BN in ((1024, 512), (1024, 1024), (2048, 2048), (512, 3584), (256, 14336)):
        if (K // 2) % BKh or N % BN:
            continue
        try:
            dt = timeit(make_null(BKh, BN, jnp.uint8, N), xh, qw)
            report(f"pallas DMA-only u8 block=({BKh},{BN})", dt, WBYTES)
        except Exception as e:
            print(f"DMA-only ({BKh},{BN}) FAIL {str(e)[:120]}", flush=True)

    # ---------- int32 view of the same bytes ----------
    qw32 = jax.lax.bitcast_convert_type(
        qw.reshape(K // 2, N // 4, 4), jnp.int32
    )  # [K/2, N/4] int32
    for BKh, BN in ((1024, 256), (512, 3584 // 4)):
        try:
            dt = timeit(make_null(BKh, BN, jnp.int32, N // 4), xh, qw32)
            report(f"pallas DMA-only i32view block=({BKh},{BN})", dt, WBYTES)
        except Exception as e:
            print(f"DMA-only i32 ({BKh},{BN}) FAIL {str(e)[:120]}", flush=True)

    # ---------- block-major contiguous storage ----------
    BKh, BN = 1024, 512
    qw_bm = jnp.transpose(
        qw.reshape(K // 2 // BKh, BKh, N // BN, BN), (0, 2, 1, 3)
    ).reshape(-1, BKh, BN)  # [nblocks, BKh, BN] contiguous blocks

    def kNullBM(x_ref, qw_ref, o_ref):
        o_ref[...] = x_ref[:, :128].astype(jnp.float32)

    def call_bm(xx, qq):
        return pl.pallas_call(
            kNullBM,
            grid=(qq.shape[0],),
            in_specs=[
                pl.BlockSpec((M, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BKh, BN), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        )(xx, qq)

    try:
        dt = timeit(call_bm, xh, qw_bm)
        report("pallas DMA-only u8 BLOCK-MAJOR (1024,512)", dt, WBYTES)
    except Exception as e:
        print("block-major FAIL", str(e)[:160], flush=True)

    # ---------- block-major + real compute (variant E body) ----------
    g = 128
    gh = g // 2
    s = jax.random.uniform(jax.random.fold_in(key, 3), (K // g, N), jnp.float32)
    s_bm = jnp.transpose(
        s.reshape(K // g // (BKh * 2 // g), BKh * 2 // g, N // BN, BN), (0, 2, 1, 3)
    ).reshape(-1, BKh * 2 // g, BN)
    xq = (xh * 16).astype(jnp.int8)
    x2q = (xh * 8).astype(jnp.int8)
    G_blk = BKh * 2 // g
    NKB = (K // 2) // BKh

    def kE_bm(x_ref, x2_ref, qw_ref, s_ref, o_ref, acc):
        b = pl.program_id(0)
        k = b % NKB

        @pl.when(k == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        p8 = jax.lax.bitcast_convert_type(qw_ref[0], jnp.int8)
        lo8 = p8 & jnp.int8(0x0F)
        hi8 = p8 & jnp.int8(-16)
        a = jnp.zeros_like(acc[...])
        for G in range(G_blk):
            r0, r1 = G * gh, (G + 1) * gh
            dlo = jnp.dot(x_ref[:, r0:r1], lo8[r0:r1], preferred_element_type=jnp.int32)
            dhi = jnp.dot(x2_ref[:, r0:r1], hi8[r0:r1], preferred_element_type=jnp.int32)
            sg = s_ref[0, G, :][None, :]
            a += (dlo.astype(jnp.float32) + dhi.astype(jnp.float32) * (1.0 / 16.0)) * sg
        acc[...] += a

        @pl.when(k == NKB - 1)
        def _():
            o_ref[...] = acc[...].astype(jnp.bfloat16)

    def call_E_bm(xx, x2, qq, ss):
        return pl.pallas_call(
            kE_bm,
            grid=(qq.shape[0],),
            in_specs=[
                pl.BlockSpec((M, BKh), lambda b: (0, b % NKB), memory_space=pltpu.VMEM),
                pl.BlockSpec((M, BKh), lambda b: (0, b % NKB), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BKh, BN), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G_blk, BN), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (M, BN), lambda b: (0, b // NKB), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
        )(xx, x2, qq, ss)

    # block-major grid: b enumerates (n, k) pairs with k fastest
    qw_bm2 = jnp.transpose(
        qw.reshape(NKB, BKh, N // BN, BN), (2, 0, 1, 3)
    ).reshape(-1, BKh, BN)
    s_bm2 = jnp.transpose(
        s.reshape(NKB, G_blk, N // BN, BN), (2, 0, 1, 3)
    ).reshape(-1, G_blk, BN)
    try:
        dt = timeit(call_E_bm, xq, x2q, qw_bm2, s_bm2)
        report("pallas E int8-MXU BLOCK-MAJOR", dt, WBYTES)
    except Exception as e:
        print("E block-major FAIL", str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
