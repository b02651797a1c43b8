"""INT8 KV cache: halved KV memory with near-identical logits
(reference fp8/int8 KV cache, `--kv-cache-dtype`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.ops.xla_attention import QuantKVPool

VOCAB = 128


def test_int8_kv_close_to_fp32(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("int8kv_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(d, safe_serialization=True)

    common = dict(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    e32 = Engine(**common)
    e8 = Engine(**common, kv_cache_dtype="int8")
    try:
        assert isinstance(e8.model_runner.kv_pool, QuantKVPool)
        assert e8.model_runner.kv_pool.data.dtype == jnp.int8

        prompt = list(np.random.default_rng(0).integers(3, VOCAB, size=24))
        sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
        o32 = e32.generate(input_ids=prompt, sampling_params=sp,
                           return_logprob=True)
        o8 = e8.generate(input_ids=prompt, sampling_params=sp,
                         return_logprob=True)
        # same greedy tokens for a clean prompt and per-token logprobs close
        assert o8["output_ids"] == o32["output_ids"]
        lp32 = [x[0] for x in o32["meta_info"]["output_token_logprobs"]]
        lp8 = [x[0] for x in o8["meta_info"]["output_token_logprobs"]]
        np.testing.assert_allclose(lp8, lp32, atol=0.08)
    finally:
        e32.shutdown()
        e8.shutdown()
