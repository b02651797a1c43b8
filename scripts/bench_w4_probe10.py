"""Probe 10: round-4 production W4 entry points (prep fused in-kernel)
at decode batch sizes 64 and 128.  Run ON the TPU under `timeout`."""

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
g = 128
WBYTES = K * N // 2


def report(name, dt, nbytes=WBYTES):
    print(f"{name:44s}: {dt*1e6:9.1f} us  {nbytes/dt/1e9:7.1f} GB/s", flush=True)


def main():
    from sglang_npu_tpu.layers.quantization import dequant, quantize_params_w4
    from sglang_npu_tpu.ops.pallas.quant_matmul import (
        matmul_w4,
        matmul_w4a8,
        matmul_w4a16x2,
    )

    print("backend:", jax.default_backend(), flush=True)
    print(f"tunnel fixed overhead: {fixed_overhead()*1e3:.2f} ms", flush=True)
    key = jax.random.key(1)
    w = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.05
    qw = quantize_params_w4({"layers": {"wq": w}}, group_size=g)["layers"]["wq"]
    for M in (64, 128):
        x = jax.random.normal(jax.random.fold_in(key, M), (M, K), jnp.bfloat16)
        ref = np.asarray(jnp.asarray(x, jnp.float32) @ dequant(qw, jnp.float32))
        for name, fn in (
            ("matmul_w4 (bf16 A16)", matmul_w4),
            ("matmul_w4a16x2 (int8x2 A16)", matmul_w4a16x2),
            ("matmul_w4a8 (int8 A8)", matmul_w4a8),
        ):
            try:
                got = np.asarray(
                    fn(x, qw.q, qw.s, qw.b, group_size=g)
                ).astype(np.float32)
                err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
                dt = timeit(
                    lambda xx, q, s, b: fn(xx, q, s, b, group_size=g),
                    x, qw.q, qw.s, qw.b,
                )
                report(f"M={M} {name} err={err:.4f}", dt)
            except Exception as e:
                print(f"M={M} {name}: FAIL {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
