"""On-chip smoke: quantized-KV pallas kernels compile under Mosaic and
match the f32 kernels within int8 tolerance. Run under `timeout`."""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sglang_npu_tpu.ops.pallas.decode_kernel import paged_decode_attention_fused
from sglang_npu_tpu.ops.pallas.prefill_kernel import paged_prefill_attention_fused
from sglang_npu_tpu.ops.pallas.quant_kv import (
    PagedQuantKV,
    quant_store_rows,
    scale_shape,
)

print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(0)
B, Hq, Hkv, D, ps, P, L = 2, 8, 2, 128, 16, 8, 2
NPt = P * B + 1
pool = rng.standard_normal((L, 2, Hkv, NPt, ps, D)).astype(np.float32) * 0.5
q = rng.standard_normal((B, Hq, D)).astype(np.float32)
nk = rng.standard_normal((B, Hkv, D)).astype(np.float32)
nv = rng.standard_normal((B, Hkv, D)).astype(np.float32)
pages = rng.permutation(np.arange(1, B * P + 1))[: B * P].reshape(B, P)
seq_lens = rng.integers(2, P * ps, size=B).astype(np.int32)
layer = jnp.int32(1)

qpool = PagedQuantKV(
    data=jnp.zeros((L, 2, Hkv, NPt, ps, D), jnp.int8),
    scale=jnp.zeros(scale_shape(L, Hkv, NPt), jnp.float32),
)
allp = np.repeat(np.arange(NPt), ps)
allo = np.tile(np.arange(ps), NPt)
vals = pool[:, :, :, allp, allo]
qpool = quant_store_rows(qpool, jnp.asarray(allp), jnp.asarray(allo), jnp.asarray(vals))

bq = jnp.asarray(q, jnp.bfloat16)
bnk = jnp.asarray(nk, jnp.bfloat16)
bnv = jnp.asarray(nv, jnp.bfloat16)
jp = jnp.asarray(pages, jnp.int32)
js = jnp.asarray(seq_lens)

ref_out, _ = paged_decode_attention_fused(
    bq, bnk, bnv, jnp.asarray(pool, jnp.bfloat16), layer, jp, js,
    page_size=ps, scale=0.125,
)
out, qpool2 = paged_decode_attention_fused(
    bq, bnk, bnv, qpool, layer, jp, js, page_size=ps, scale=0.125,
)
a, b = np.asarray(ref_out, np.float32), np.asarray(out, np.float32)
err = np.abs(a - b).max()
print("decode quant-vs-f32 max err:", err, flush=True)
assert err < 0.1, err

E = 32
q2 = jnp.asarray(rng.standard_normal((B, E, Hq, D)), jnp.bfloat16)
nk2 = jnp.asarray(rng.standard_normal((B, E, Hkv, D)), jnp.bfloat16)
nv2 = jnp.asarray(rng.standard_normal((B, E, Hkv, D)), jnp.bfloat16)
prefix = (rng.integers(0, 3, size=B) * ps).astype(np.int32)
seq2 = jnp.asarray(prefix + E)
pref = jnp.asarray(prefix)

ref2, _ = paged_prefill_attention_fused(
    q2, nk2, nv2, jnp.asarray(pool, jnp.bfloat16), layer, jp, seq2, pref,
    page_size=ps, scale=0.125,
)
# NB: compare against qpool (pre-decode), not qpool2 — the decode call
# above inserted nk/nv rows into qpool2's pages, which the bf16 reference
# pool does not contain.
out2, _ = paged_prefill_attention_fused(
    q2, nk2, nv2, qpool, layer, jp, seq2, pref, page_size=ps, scale=0.125,
)
a2, b2 = np.asarray(ref2, np.float32), np.asarray(out2, np.float32)
err2 = np.abs(a2 - b2).max()
print("prefill quant-vs-f32 max err:", err2, flush=True)
assert err2 < 0.12, err2
print("SMOKE-OK", flush=True)
