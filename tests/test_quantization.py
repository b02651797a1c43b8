"""Weight-only INT8 quantization: memory halves, greedy output preserved
for well-conditioned weights (reference `layers/quantization/w8a8_int8.py`
capability, weight-only variant)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.layers.quantization import QuantizedWeight


def test_int8_weights(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("q_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(d, safe_serialization=True)

    common = dict(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    e = Engine(**common)
    eq = Engine(**common, quantization="int8")
    try:
        # projections fuse at tp=1 (merge_projections): wq lives in w_qkv
        wq = eq.model_runner.params["layers"]["w_qkv"]
        assert isinstance(wq, QuantizedWeight)
        assert wq.q.dtype == jax.numpy.int8

        bytes_full = sum(
            x.nbytes for x in jax.tree_util.tree_leaves(
                e.model_runner.params["layers"]
            )
        )
        bytes_q = sum(
            x.nbytes for x in jax.tree_util.tree_leaves(
                eq.model_runner.params["layers"]
            )
        )
        assert bytes_q < bytes_full * 0.35  # f32 -> int8 (+scales)

        prompt = list(np.random.default_rng(0).integers(3, 128, size=16))
        sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
        o = e.generate(input_ids=prompt, sampling_params=sp)
        oq = eq.generate(input_ids=prompt, sampling_params=sp)
        # per-channel int8 weight quantization is near-lossless for greedy
        assert oq["output_ids"] == o["output_ids"]
    finally:
        e.shutdown()
        eq.shutdown()
