"""Probe: weight-only W8 Pallas kernel (int8 / fp8-e4m3) on chip — does
Mosaic take the f8 convert, and what's the stream rate vs the XLA
dequant-einsum at decode batch sizes?  Run ON the TPU under `timeout`."""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from probe_util import fixed_overhead, timeit

K, N = 4096, 14336


def report(name, dt, nbytes):
    print(f"{name:44s}: {dt*1e6:9.1f} us  {nbytes/dt/1e9:7.1f} GB/s", flush=True)


def main():
    from sglang_npu_tpu.ops.pallas.quant_matmul import matmul_w8

    print("backend:", jax.default_backend(), flush=True)
    print(f"tunnel fixed overhead: {fixed_overhead()*1e3:.2f} ms", flush=True)
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    for dt8, qmax, nb in ((jnp.int8, 127.0, K * N), (jnp.float8_e4m3fn, 448.0, K * N)):
        s = np.abs(w).max(axis=0, keepdims=True) / qmax
        q = w / s
        if dt8 == jnp.int8:
            q = np.clip(np.round(q), -127, 127)
        qj = jax.jit(lambda a: a.astype(dt8))(jnp.asarray(q, jnp.float32))
        sj = jnp.asarray(s)
        ref = np.asarray(w)
        for M in (64, 128, 256):
            x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
            try:
                got = np.asarray(matmul_w8(x, qj, sj))
                want = np.asarray(x, np.float32) @ (
                    np.asarray(qj.astype(jnp.float32)) * s
                )
                err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
                t = timeit(lambda xx, qq, ss: matmul_w8(xx, qq, ss), x, qj, sj)
                report(f"pallas w8 {dt8.__name__} M={M} err={err:.4f}", t, nb)
            except Exception as e:
                print(f"pallas w8 {dt8.__name__} M={M}: FAIL {str(e)[:140]}",
                      flush=True)
        # XLA dequant-einsum comparison
        for M in (64, 256):
            x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
            f = jax.jit(
                lambda xx, qq, ss: xx @ (qq.astype(jnp.bfloat16) * ss.astype(jnp.bfloat16))
            )
            t = timeit(lambda xx, qq=qj, ss=sj: f(xx, qq, ss), x)
            report(f"XLA dequant-dot {dt8.__name__} M={M}", t, nb)


if __name__ == "__main__":
    main()
