"""MoE model family: HF-diff numerics for Qwen2-MoE and Mixtral
(reference `test/srt/models/test_generation_models.py` pattern)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def make_engine(tmp, hf_model, **kw):
    d = tmp
    hf_model.save_pretrained(d, safe_serialization=True)
    return Engine(
        model_path=str(d),
        dtype="float32",
        skip_tokenizer_init=True,
        page_size=4,
        max_total_tokens=4096,
        attention_backend="xla",
        random_seed=0,
        **kw,
    )


def check_greedy_match(engine, hf, prompts, n=5):
    outs = engine.generate(
        input_ids=prompts,
        sampling_params={"max_new_tokens": n, "temperature": 0.0, "ignore_eos": True},
    )
    if not isinstance(outs, list):
        outs = [outs]
    for p, o in zip(prompts, outs):
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([p]), max_new_tokens=n, do_sample=False
            )[0][len(p):].tolist()
        assert o["output_ids"] == ref, f"got {o['output_ids']} want {ref}"


def test_qwen2_moe_matches_hf(tmp_path_factory):
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=VOCAB,
        hidden_size=32,
        intermediate_size=64,
        moe_intermediate_size=32,
        shared_expert_intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=False,
        max_position_embeddings=256,
        tie_word_embeddings=False,
        torch_dtype="float32",
        eos_token_id=2,
        decoder_sparse_step=1,
        mlp_only_layers=[],
    )
    torch.manual_seed(0)
    hf = transformers.Qwen2MoeForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("qwen2moe")
    e = make_engine(d, hf)
    try:
        rng = np.random.default_rng(0)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (6, 14)]
        check_greedy_match(e, hf, prompts)
    finally:
        e.shutdown()


def test_mixtral_matches_hf(tmp_path_factory):
    cfg = transformers.MixtralConfig(
        vocab_size=VOCAB,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=256,
        tie_word_embeddings=False,
        torch_dtype="float32",
        eos_token_id=2,
        sliding_window=None,
    )
    torch.manual_seed(1)
    hf = transformers.MixtralForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("mixtral")
    e = make_engine(d, hf)
    try:
        rng = np.random.default_rng(1)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (7, 12)]
        check_greedy_match(e, hf, prompts)
    finally:
        e.shutdown()
