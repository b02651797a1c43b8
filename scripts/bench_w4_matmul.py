"""On-chip microbenchmark: W4/INT8/FP8 matmul strategies vs bf16.

Decode GEMM shape (Llama-8B FFN): x [M, 4096] @ w [4096, 14336].
Decode is weight-bandwidth-bound, so the metric that matters is effective
HBM GB/s of weight streaming; tok/s scales with it.

Run ON THE TPU (no JAX_PLATFORMS override), wrapped in `timeout`:
    timeout 1200 python scripts/bench_w4_matmul.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sglang_npu_tpu.layers.quantization import (
    dequant,
    quantize_params_fp8,
    quantize_params_int8,
    quantize_params_w4,
)
from sglang_npu_tpu.ops.pallas.quant_matmul import matmul_w4

M, K, N = 64, 4096, 14336
ITERS = 50


def timeit(fn, *args):
    """Times ITERS invocations INSIDE one jit (lax.fori_loop) — per-call
    dispatch latency through the tunneled PJRT backend is ~1ms and would
    otherwise dominate; the fused loop measures pure device throughput."""

    @jax.jit
    def loop(*a):
        def body(i, acc):
            # perturb the activation with the carry so the matmul cannot be
            # hoisted out of the loop (runtime value, underflows to 0)
            xi = a[0] + (acc * 1e-30).astype(a[0].dtype)
            out = fn(xi, *a[1:])
            return acc + out[0, :1].astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((1,), jnp.float32))

    s = float(np.asarray(jax.device_get(loop(*args))))  # compile+warm
    t0 = time.time()
    s = float(np.asarray(jax.device_get(loop(*args))))
    dt = (time.time() - t0) / ITERS
    return dt, s


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.key(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 1), (K, N), jnp.bfloat16)

    results = {}

    f_bf16 = jax.jit(lambda x, w: jnp.einsum("mk,kn->mn", x, w))
    dt, _ = timeit(f_bf16, x, w)
    results["bf16"] = dt

    p8 = quantize_params_int8({"layers": {"wq": w}})["layers"]["wq"]
    f_i8 = jax.jit(lambda x, q, s: jnp.einsum("mk,kn->mn", x, q.astype(x.dtype) * s.astype(x.dtype)))
    dt, _ = timeit(f_i8, x, p8.q, p8.s)
    results["int8_xla"] = dt

    pf8 = quantize_params_fp8({"layers": {"wq": w}})["layers"]["wq"]
    f_f8 = jax.jit(lambda x, q, s: jnp.einsum("mk,kn->mn", x, q.astype(x.dtype) * s.astype(x.dtype)))
    dt, _ = timeit(f_f8, x, pf8.q, pf8.s)
    results["fp8_xla"] = dt

    p4 = quantize_params_w4({"layers": {"wq": w}})["layers"]["wq"]
    f_w4_xla = jax.jit(lambda x, qw: jnp.einsum("mk,kn->mn", x, dequant(qw, x.dtype)))
    dt, _ = timeit(f_w4_xla, x, p4)
    results["w4_xla"] = dt

    f_w4_pl = jax.jit(
        lambda x, q, s, b: matmul_w4(x, q, s, b, group_size=128)
    )
    dt, _ = timeit(f_w4_pl, x, p4.q, p4.s, p4.b)
    results["w4_pallas"] = dt

    bytes_by = {
        "bf16": K * N * 2,
        "int8_xla": K * N,
        "fp8_xla": K * N,
        "w4_xla": K * N // 2,
        "w4_pallas": K * N // 2,
    }
    for k, dt in results.items():
        gbs = bytes_by[k] / dt / 1e9
        print(
            f"{k:10s} {dt*1e6:9.1f} us   weight-stream {gbs:7.1f} GB/s   "
            f"speedup vs bf16 {results['bf16']/dt:5.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
