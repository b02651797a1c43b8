"""Round-5 decode-step component breakdown on the real chip.

VERDICT r4 item 1: llama8b_w4a8 posts 17.6% decode HBM util at batch 256
while fp8@64 reaches 63% — find where the other 82% goes.  This probe
times each component of one decode step at the bench shapes:

  * paged decode attention kernel (int8 KV, B in {64, 256}, ctx 192)
  * per-layer matmuls (qkv 4096->6144, o 4096->4096, gateup 4096->28672,
    down 14336->4096) for every weight path: w4 bf16-dequant kernel,
    w4a8 int8-MXU kernel, w8 int8 Pallas, w8a8 XLA int8 einsum, bf16
    dense, fp8 XLA dequant
  * lm head bf16 [256, 4096] x [4096, 128256]

and prints a predicted step time (32 layers + head) next to each path.

Usage: timeout 2400 python scripts/r5_probe_decode.py [attn|mm|head|all]
Run ON the TPU; components compile fresh (minutes each, cached after).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from probe_util import fixed_overhead, timeit

L8B = dict(hidden=4096, inter=14336, nq=32, nkv=8, d=128, vocab=128256)
SHAPES = [  # (name, K, N) fused production shapes
    ("qkv", 4096, 6144),
    ("o", 4096, 4096),
    ("gateup", 4096, 28672),
    ("down", 14336, 4096),
]


def log(msg):
    print(msg, flush=True)


def bench_attn(B, ctx, kv_dtype, page_size, iters=30):
    from sglang_npu_tpu.ops.pallas.decode_kernel import (
        paged_decode_attention_fused,
    )
    from sglang_npu_tpu.ops.pallas.quant_kv import PagedQuantKV, scale_shape

    Hkv, G, D = L8B["nkv"], L8B["nq"] // L8B["nkv"], L8B["d"]
    pages_per_seq = -(-(ctx + 1) // page_size)
    NP = B * (pages_per_seq + 1) + 8
    key = jax.random.PRNGKey(0)
    # scattered page assignment like a radix-allocated pool
    pt_np = np.random.default_rng(0).permutation(NP)[: B * pages_per_seq]
    pt = jnp.asarray(pt_np.reshape(B, pages_per_seq), jnp.int32)
    seq_lens = jnp.full((B,), ctx, jnp.int32)
    q = jax.random.normal(key, (B, Hkv * G, D), jnp.bfloat16)
    nk = jax.random.normal(key, (B, Hkv, D), jnp.bfloat16)
    nv = jax.random.normal(key, (B, Hkv, D), jnp.bfloat16)
    if kv_dtype == "int8":
        data = jnp.zeros((1, 2, Hkv, NP, page_size, D), jnp.int8)
        scale = jnp.full(scale_shape(1, Hkv, NP), 0.05, jnp.float32)
        pool = PagedQuantKV(data=data, scale=scale)

        @jax.jit
        def loop(q, nk, nv, data, scale):
            def body(i, carry):
                acc, data, scale = carry
                qi = q + (acc[0] * 1e-30).astype(q.dtype)
                out, p = paged_decode_attention_fused(
                    qi, nk, nv, PagedQuantKV(data=data, scale=scale),
                    jnp.int32(0), pt, seq_lens, page_size, 0.088,
                )
                return (
                    acc + out.reshape(-1)[:1].astype(jnp.float32) * 1e-9,
                    p.data, p.scale,
                )

            return jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((1,), jnp.float32), data, scale)
            )[0]

        args = (q, nk, nv, data, scale)
    else:
        data = jnp.zeros((1, 2, Hkv, NP, page_size, D), jnp.bfloat16)

        @jax.jit
        def loop(q, nk, nv, data):
            def body(i, carry):
                acc, data = carry
                qi = q + (acc[0] * 1e-30).astype(q.dtype)
                out, p = paged_decode_attention_fused(
                    qi, nk, nv, data, jnp.int32(0), pt, seq_lens,
                    page_size, 0.088,
                )
                return (
                    acc + out.reshape(-1)[:1].astype(jnp.float32) * 1e-9,
                    p,
                )

            return jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((1,), jnp.float32), data)
            )[0]

        args = (q, nk, nv, data)

    fixed = fixed_overhead()
    t0 = time.time()
    np.asarray(jax.device_get(loop(*args)))  # compile + warm
    log(f"  [compile+warm {time.time()-t0:.0f}s]")
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        np.asarray(jax.device_get(loop(*args)))
        best = min(best, time.time() - t0)
    t = max(best - fixed, 1e-9) / iters
    kv_bytes = (
        B * ctx * 2 * Hkv * D * (1 if kv_dtype == "int8" else 2)
    )
    log(
        f"attn B={B} ctx={ctx} kv={kv_dtype} ps={page_size}: "
        f"{t*1e3:.3f} ms/layer-call  x32={32*t*1e3:.1f} ms  "
        f"{kv_bytes/t/1e9:.0f} GB/s  {t*1e6/B:.2f} us/seq"
    )
    return t


def _mk_w4(key, K, N, g=128):
    from sglang_npu_tpu.layers.quantization import QuantizedWeightW4

    kq, ks = jax.random.split(key)
    q = jax.random.randint(kq, (K // 2, N), 0, 255, jnp.int32).astype(jnp.uint8)
    s = jax.random.uniform(ks, (K // g, N), jnp.float32, 0.001, 0.01)
    b = s * 8.0
    return QuantizedWeightW4(q=q, s=s, b=b)


def bench_mm(M, paths=("w4", "w4a8", "w8", "w8a8", "bf16", "fp8")):
    from sglang_npu_tpu.ops.pallas.quant_matmul import (
        matmul_w4, matmul_w4a8, matmul_w8,
    )

    key = jax.random.PRNGKey(1)
    totals = {}
    for name, K, N in SHAPES:
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w4 = _mk_w4(key, K, N)
        w8q = jax.random.randint(key, (K, N), -127, 128, jnp.int32).astype(
            jnp.int8
        )
        w8s = jnp.full((1, N), 0.01, jnp.float32)
        wb = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.01
        wf8 = wb.astype(jnp.float8_e4m3fn)
        int4_bytes = K * N // 2 + (K // 128) * N * 8
        int8_bytes = K * N + N * 4
        bf16_bytes = K * N * 2

        def xla_w8a8(x, q, s):
            x32 = x.astype(jnp.float32)
            sx = jnp.maximum(
                jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-9
            ) / 127.0
            xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
            d = jnp.einsum("mk,kn->mn", xq, q, preferred_element_type=jnp.int32)
            return (d.astype(jnp.float32) * sx * s).astype(x.dtype)

        def xla_fp8(x, q, s):
            return jnp.einsum(
                "mk,kn->mn", x, q.astype(jnp.bfloat16) * s.astype(jnp.bfloat16)
            )

        cands = {
            "w4": (lambda x, w=w4: matmul_w4(x, w.q, w.s, w.b), int4_bytes),
            "w4a8": (lambda x, w=w4: matmul_w4a8(x, w.q, w.s, w.b), int4_bytes),
            "w8": (lambda x: matmul_w8(x, w8q, w8s), int8_bytes),
            "w8a8": (lambda x: xla_w8a8(x, w8q, w8s), int8_bytes),
            "bf16": (lambda x: jnp.dot(x, wb), bf16_bytes),
            "fp8": (lambda x: xla_fp8(x, wf8, w8s), int8_bytes),
        }
        for p in paths:
            fn, nbytes = cands[p]
            try:
                t = timeit(fn, x, iters=100)
            except Exception as e:
                log(f"mm M={M} {name} {p}: FAIL {type(e).__name__} {str(e)[:120]}")
                continue
            totals[p] = totals.get(p, 0.0) + t
            log(
                f"mm M={M} {name} [{K}x{N}] {p}: {t*1e3:.3f} ms  "
                f"{nbytes/t/1e9:.0f} GB/s  "
                f"{2*M*K*N/t/1e12:.1f} TFLOP/s"
            )
    for p, t in totals.items():
        log(f"mm M={M} TOTAL {p}: {t*1e3:.3f} ms/layer  x32={32*t*1e3:.1f} ms")
    return totals


def bench_head(M):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (M, L8B["hidden"]), jnp.bfloat16)
    w = jax.random.normal(key, (L8B["hidden"], L8B["vocab"]), jnp.bfloat16) * 0.01
    t = timeit(lambda x: jnp.dot(x, w), x, iters=50)
    log(
        f"head M={M}: {t*1e3:.3f} ms  "
        f"{L8B['hidden']*L8B['vocab']*2/t/1e9:.0f} GB/s"
    )
    return t


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(f"devices: {jax.devices()}  fixed_overhead={fixed_overhead()*1e3:.1f} ms")
    if what in ("attn", "all"):
        bench_attn(256, 192, "int8", 16)
        bench_attn(64, 192, "int8", 16)
        bench_attn(256, 192, "bf16", 16)
    if what in ("mm", "all"):
        bench_mm(256)
    if what in ("head", "all"):
        bench_head(256)
    if what == "mm64":
        bench_mm(64)
    if what == "attn2":  # page-size sweep: DMA issue count is the wall
        bench_attn(256, 192, "int8", 32)
        bench_attn(256, 192, "int8", 64)
        bench_attn(256, 192, "bf16", 64)
        bench_attn(256, 192, "int8", 128)
    if what == "scanmm":
        bench_scan_mm(256, zp=False)
        bench_scan_mm(256, zp=True)
    if what == "attn3":  # post-rework: ps32 at high iters (tunnel noise
        # at iters=30 is ~±0.5ms/call — the earlier 0.39/0.0 readings)
        bench_attn(256, 192, "int8", 32, iters=150)
        bench_attn(256, 192, "bf16", 32, iters=150)


def bench_scan_mm(M, L=32, zp=False, iters=20):
    """The engine-shaped matmul structure: weights stacked [L, ...] and
    consumed via lax.scan (like llama.backbone_forward), all 4 fused
    production matmuls per layer.  Isolates the scan-slice / per-call
    overhead the bare-kernel probe (bench_mm) does not see.  zp=True adds
    the einsum_w4 zero-point epilogue like the production path."""
    from sglang_npu_tpu.layers.quantization import QuantizedWeightW4
    from sglang_npu_tpu.ops.pallas.quant_matmul import einsum_w4, matmul_w4

    key = jax.random.PRNGKey(3)

    @jax.jit
    def mk_stacked():
        # build ON DEVICE (closure capture would ship GBs of constants
        # through the remote-compile path)
        out = {}
        for name, K, N in SHAPES:
            w = _mk_w4(key, K, N)
            out[name] = QuantizedWeightW4(
                q=jnp.tile(w.q[None], (L, 1, 1)),
                s=jnp.tile(w.s[None], (L, 1, 1)),
                b=jnp.tile(w.b[None], (L, 1, 1)),
            )
        return out

    stacked = jax.block_until_ready(mk_stacked())
    x0 = jax.random.normal(key, (M, 14336), jnp.bfloat16)

    @jax.jit
    def run(x0, stacked):
        def layer(x, lw):
            acc = jnp.float32(0.0)
            for name, K, N in SHAPES:
                w = QuantizedWeightW4(
                    q=lw[name].q, s=lw[name].s, b=lw[name].b
                )
                if zp:
                    o = einsum_w4(x[:, :K], w, "mk,kn->mn")
                else:
                    o = matmul_w4(x[:, :K], w.q, w.s, w.b)
                acc = acc + o[0, 0].astype(jnp.float32)
            x = x + (acc * 1e-30).astype(x.dtype)
            return x, None

        def body(i, x):
            out, _ = jax.lax.scan(layer, x, stacked)
            return out

        return jax.lax.fori_loop(0, iters, body, x0)

    fixed = fixed_overhead()
    t0 = time.time()
    np.asarray(jax.device_get(run(x0, stacked)))
    log(f"  [compile+warm {time.time()-t0:.0f}s]")
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        np.asarray(jax.device_get(run(x0, stacked)))
        best = min(best, time.time() - t0)
    t = max(best - fixed, 1e-9) / iters
    packed = sum(K * N // 2 + (K // 128) * N * 8 for _, K, N in SHAPES) * L
    log(
        f"scanmm M={M} L={L} zp={zp}: {t*1e3:.1f} ms/step "
        f"({t*1e3/L:.3f} ms/layer, {packed/t/1e9:.0f} GB/s)"
    )


if __name__ == "__main__":
    main()
