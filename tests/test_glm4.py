"""GLM-4 family parity vs HF transformers.

Reference behaviors: HF `modeling_glm4.py` (sandwich norms, fused
gate_up, qkv bias, partial interleaved rope) and `modeling_glm4_moe.py`
(sigmoid + e_score_correction_bias group top-k routing, shared experts).
Greedy outputs must match `model.generate(do_sample=False)` exactly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def _check(engine, hf, prompts, n=6):
    outs = engine.generate(
        input_ids=prompts,
        sampling_params={"max_new_tokens": n, "temperature": 0.0,
                         "ignore_eos": True},
    )
    for p, o in zip(prompts, outs):
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([p]), max_new_tokens=n, do_sample=False
            )[0][len(p):].tolist()
        # HF stops at EOS; we run with ignore_eos -> compare its span
        got = o["output_ids"][: len(ref)]
        assert got == ref, f"got {got} want {ref}"


def test_glm4_dense_matches_hf(tmp_path_factory):
    cfg = transformers.Glm4Config(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = transformers.Glm4ForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("glm4")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    try:
        rng = np.random.default_rng(0)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (6, 14, 25)]
        _check(e, hf, prompts)
    finally:
        e.shutdown()


@pytest.mark.parametrize("groups", [(1, 1), (2, 1)])
def test_glm4_moe_matches_hf(tmp_path_factory, groups):
    n_group, topk_group = groups
    cfg = transformers.Glm4MoeConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        n_group=n_group, topk_group=topk_group, routed_scaling_factor=1.0,
        norm_topk_prob=True, first_k_dense_replace=1, use_qk_norm=True,
        partial_rotary_factor=0.5, attention_bias=False,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = transformers.Glm4MoeForCausalLM(cfg)
    hf.eval()
    # give the correction bias real values (checkpoints ship nonzero ones)
    with torch.no_grad():
        for layer in hf.model.layers:
            if hasattr(layer.mlp, "gate"):
                layer.mlp.gate.e_score_correction_bias.uniform_(0.05, 0.5)
    d = tmp_path_factory.mktemp(f"glm4moe_{n_group}")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    try:
        rng = np.random.default_rng(1)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (5, 19)]
        _check(e, hf, prompts)
    finally:
        e.shutdown()


def test_glm_dense_arch_alias(tmp_path_factory):
    """GlmForCausalLM (glm-4-9b, 2-norm variant) rides the Glm4Moe class
    with zero experts."""
    cfg = transformers.GlmConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(2)
    hf = transformers.GlmForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("glm_dense")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        rng = np.random.default_rng(3)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (7, 12)]
        _check(e, hf, prompts, n=5)
    finally:
        e.shutdown()
