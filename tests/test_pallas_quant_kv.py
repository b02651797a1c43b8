"""Quantized-KV Pallas kernels (interpret mode): decode/prefill with
int8 `PagedQuantKV` must track the f32 kernels within quantization error,
including the in-kernel scale maintenance (page requant on scale growth).

Reference behavior: fp8/int8 KV cache in `srt/mem_cache/memory_pool.py`
`set_kv_buffer` scale/cast paths — here with dynamic per-(head, page)
scales instead of static calibration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_npu_tpu.ops.pallas.decode_kernel import paged_decode_attention_fused
from sglang_npu_tpu.ops.pallas.prefill_kernel import paged_prefill_attention_fused
from sglang_npu_tpu.ops.pallas.quant_kv import (
    PagedQuantKV,
    dequant_rows,
    quant_store_rows,
    scale_shape,
)
from sglang_npu_tpu.ops.xla_attention import paged_attention_xla, write_kv


def make_qpool(L, Hkv, num_pages, ps, D):
    return PagedQuantKV(
        data=jnp.zeros((L, 2, Hkv, num_pages, ps, D), jnp.int8),
        scale=jnp.zeros(scale_shape(L, Hkv, num_pages), jnp.float32),
    )


def fill_pool_via_store(qpool, pool_f32, seq_pages, ps):
    """Write reference f32 rows into the quant pool page by page."""
    num_pages = pool_f32.shape[3]
    # store every page's rows (pages are wholly owned here)
    pages = np.repeat(np.arange(num_pages), ps)
    offs = np.tile(np.arange(ps), num_pages)
    vals = pool_f32[:, :, :, pages, offs]  # [L, 2, H, n, D]
    return quant_store_rows(
        qpool, jnp.asarray(pages), jnp.asarray(offs), jnp.asarray(vals)
    )


def test_store_dequant_roundtrip():
    rng = np.random.default_rng(0)
    L, Hkv, NP, ps, D = 2, 2, 7, 8, 64
    qpool = make_qpool(L, Hkv, NP, ps, D)
    vals = rng.standard_normal((L, 2, Hkv, 3, D)).astype(np.float32)
    pages = jnp.asarray([1, 1, 2])
    offs = jnp.asarray([0, 1, 0])
    qpool = quant_store_rows(qpool, pages, offs, jnp.asarray(vals))
    back = np.asarray(dequant_rows(qpool, pages, offs))
    # int8 with per-(head, page) scale: relative error ~1/127
    np.testing.assert_allclose(back, vals, atol=np.abs(vals).max() / 90)


def decode_case(seed=0, B=3, Hq=4, Hkv=2, D=64, ps=16, P=8, L=2):
    rng = np.random.default_rng(seed)
    num_pages = P * B + 1
    pool = rng.standard_normal((L, 2, Hkv, num_pages, ps, D)).astype(np.float32)
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    new_k = rng.standard_normal((B, Hkv, D)).astype(np.float32)
    new_v = rng.standard_normal((B, Hkv, D)).astype(np.float32)
    pages = rng.permutation(np.arange(1, B * P + 1))[: B * P].reshape(B, P)
    seq_lens = rng.integers(2, P * ps, size=B).astype(np.int32)
    return pool, q, new_k, new_v, pages, seq_lens


@pytest.mark.parametrize("seed", [0, 1])
def test_quant_decode_matches_f32(seed):
    pool, q, nk, nv, pages, seq_lens = decode_case(seed)
    L, _, Hkv, NPt, ps, D = pool.shape
    layer = jnp.int32(1)

    # f32 reference via the plain fused kernel
    ref_out, ref_pool = paged_decode_attention_fused(
        jnp.asarray(q), jnp.asarray(nk), jnp.asarray(nv), jnp.asarray(pool),
        layer, jnp.asarray(pages), jnp.asarray(seq_lens),
        page_size=ps, scale=0.125, interpret=True,
    )

    qpool = make_qpool(L, Hkv, NPt, ps, D)
    qpool = fill_pool_via_store(qpool, pool, None, ps)
    out, qpool2 = paged_decode_attention_fused(
        jnp.asarray(q), jnp.asarray(nk), jnp.asarray(nv), qpool,
        layer, jnp.asarray(pages), jnp.asarray(seq_lens),
        page_size=ps, scale=0.125, interpret=True,
    )
    assert isinstance(qpool2, PagedQuantKV)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), atol=0.06, rtol=0.05
    )
    # written token row roundtrips through int8
    pos = seq_lens - 1
    wpages = pages[np.arange(len(pos)), pos // ps]
    woffs = pos % ps
    got_rows = np.asarray(
        dequant_rows(qpool2, jnp.asarray(wpages), jnp.asarray(woffs))
    )[int(layer)]
    want_k = np.transpose(nk, (1, 0, 2))  # [Hkv, B, D]
    np.testing.assert_allclose(got_rows[0], want_k, atol=0.12, rtol=0.1)


def test_quant_decode_scale_growth_requant():
    """A new token 10x larger than page content must grow the page scale
    and requantize without destroying existing rows."""
    pool, q, nk, nv, pages, seq_lens = decode_case(3)
    L, _, Hkv, NPt, ps, D = pool.shape
    layer = jnp.int32(0)
    nk = nk * 10.0
    nv = nv * 10.0

    ref_out, _ = paged_decode_attention_fused(
        jnp.asarray(q), jnp.asarray(nk), jnp.asarray(nv), jnp.asarray(pool),
        layer, jnp.asarray(pages), jnp.asarray(seq_lens),
        page_size=ps, scale=0.125, interpret=True,
    )
    qpool = make_qpool(L, Hkv, NPt, ps, D)
    qpool = fill_pool_via_store(qpool, pool, None, ps)
    out, _ = paged_decode_attention_fused(
        jnp.asarray(q), jnp.asarray(nk), jnp.asarray(nv), qpool,
        layer, jnp.asarray(pages), jnp.asarray(seq_lens),
        page_size=ps, scale=0.125, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), atol=0.12, rtol=0.08
    )


def test_quant_prefill_matches_f32():
    rng = np.random.default_rng(5)
    B, E, Hq, Hkv, D, ps, P, L = 2, 32, 4, 2, 64, 16, 8, 2
    num_pages = P * B + 1
    pool = rng.standard_normal((L, 2, Hkv, num_pages, ps, D)).astype(np.float32) * 0.5
    q = rng.standard_normal((B, E, Hq, D)).astype(np.float32)
    nk = rng.standard_normal((B, E, Hkv, D)).astype(np.float32)
    nv = rng.standard_normal((B, E, Hkv, D)).astype(np.float32)
    pages = rng.permutation(np.arange(1, B * P + 1))[: B * P].reshape(B, P)
    prefix = (rng.integers(0, 3, size=B) * ps).astype(np.int32)
    seq_lens = (prefix + E).astype(np.int32)
    layer = jnp.int32(1)

    ref_out, _ = paged_prefill_attention_fused(
        jnp.asarray(q), jnp.asarray(nk), jnp.asarray(nv), jnp.asarray(pool),
        layer, jnp.asarray(pages), jnp.asarray(seq_lens), jnp.asarray(prefix),
        page_size=ps, scale=0.125, interpret=True,
    )
    qpool = make_qpool(L, Hkv, num_pages, ps, D)
    qpool = fill_pool_via_store(qpool, pool, None, ps)
    out, qpool2 = paged_prefill_attention_fused(
        jnp.asarray(q), jnp.asarray(nk), jnp.asarray(nv), qpool,
        layer, jnp.asarray(pages), jnp.asarray(seq_lens), jnp.asarray(prefix),
        page_size=ps, scale=0.125, interpret=True,
    )
    assert isinstance(qpool2, PagedQuantKV)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), atol=0.08, rtol=0.05
    )


def test_engine_int8_kv_pallas_interpret(tmp_path_factory, monkeypatch):
    """End-to-end: pallas backend + int8 KV (interpret mode) stays close
    to the f32 engine and allocates the PagedQuantKV pool."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from sglang_npu_tpu.entrypoints.engine import Engine

    monkeypatch.setenv("SGLANG_TPU_PALLAS_INTERPRET", "1")
    VOCAB = 128
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("qkv_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    common = dict(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=16, max_total_tokens=2048, random_seed=0,
    )
    e32 = Engine(**common, attention_backend="pallas")
    e8 = Engine(**common, attention_backend="pallas", kv_cache_dtype="int8")
    try:
        assert isinstance(e8.model_runner.kv_pool, PagedQuantKV)
        prompt = list(np.random.default_rng(0).integers(3, VOCAB, size=24))
        sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
        o32 = e32.generate(input_ids=prompt, sampling_params=sp,
                           return_logprob=True)
        o8 = e8.generate(input_ids=prompt, sampling_params=sp,
                         return_logprob=True)
        assert o8["output_ids"] == o32["output_ids"]
        lp32 = [x[0] for x in o32["meta_info"]["output_token_logprobs"]]
        lp8 = [x[0] for x in o8["meta_info"]["output_token_logprobs"]]
        np.testing.assert_allclose(lp8, lp32, atol=0.15)
    finally:
        e32.shutdown()
        e8.shutdown()
