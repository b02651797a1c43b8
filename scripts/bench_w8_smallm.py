"""Probe: matmul_w8 at SMALL M (1..32) on chip — the engine's decode and
single-request paths run M in this range, which bench_w8_probe.py never
covered (M=64+).  A hang / HTTP-500 retry loop here would explain the
int8 engine config going silent in warmup.  Run under `timeout`."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from probe_util import timeit


def main():
    from sglang_npu_tpu.ops.pallas.quant_matmul import matmul_w8

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    # engine shapes: qkv N=6144, o N=4096, gateup N=28672, down K=14336
    shapes = [(4096, 6144), (4096, 28672), (14336, 4096)]
    for K, N in shapes:
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        s = np.abs(w).max(axis=0, keepdims=True) / 127.0
        q = np.clip(np.round(w / s), -127, 127)
        qj = jax.jit(lambda a: a.astype(jnp.int8))(jnp.asarray(q, jnp.float32))
        sj = jnp.asarray(s)
        for M in (1, 4, 16, 512, 4096):
            x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
            t0 = time.time()
            try:
                got = np.asarray(matmul_w8(x, qj, sj))
                want = np.asarray(x, np.float32) @ (q * s)
                err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
                tc = time.time() - t0
                t = timeit(lambda xx: matmul_w8(xx, qj, sj), x)
                print(
                    f"w8 K={K} N={N} M={M}: compile+run {tc:6.1f}s "
                    f"err={err:.4f}  steady {t*1e6:8.1f} us "
                    f"{K*N/t/1e9:6.1f} GB/s",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"w8 K={K} N={N} M={M}: FAIL after {time.time()-t0:.1f}s "
                    f"{str(e)[:160]}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
