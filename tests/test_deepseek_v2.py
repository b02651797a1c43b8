"""DeepSeek-V2 (MLA + DeepSeek-MoE) HF-diff numerics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def test_deepseek_v2_lite_matches_hf(tmp_path_factory):
    cfg = transformers.DeepseekV2Config(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        n_routed_experts=4,
        n_shared_experts=1,
        num_experts_per_tok=2,
        first_k_dense_replace=1,
        moe_layer_freq=1,
        routed_scaling_factor=1.0,
        norm_topk_prob=False,
        topk_method="greedy",
        n_group=1,
        topk_group=1,
        kv_lora_rank=32,
        q_lora_rank=None,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        max_position_embeddings=256,
        tie_word_embeddings=False,
        torch_dtype="float32",
        eos_token_id=2,
        rope_scaling=None,
        attention_bias=False,
    )
    torch.manual_seed(0)
    hf = transformers.DeepseekV2ForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("dsv2")
    hf.save_pretrained(d, safe_serialization=True)

    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    try:
        from sglang_npu_tpu.ops.mla_attention import KPE_PAD, MLALatentPool

        # latent-cache mode: pool holds (c_kv, k_pe) only — the MLA
        # memory win (reference MLATokenToKVPool), not MHA-expanded K/V
        pool = e.model_runner.kv_pool
        assert isinstance(pool, MLALatentPool)
        assert pool.ckv.shape[-1] == cfg.kv_lora_rank
        assert pool.kpe.shape[-1] == KPE_PAD

        rng = np.random.default_rng(0)
        for n in (5, 21):
            prompt = rng.integers(3, VOCAB, size=n).tolist()
            out = e.generate(
                input_ids=prompt,
                sampling_params={"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True},
            )
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([prompt]), max_new_tokens=6, do_sample=False
                )[0][n:].tolist()
            assert out["output_ids"] == ref, f"len {n}: {out['output_ids']} != {ref}"

        # prefix-cache reuse through the latent pool: rerun the same
        # prompt (radix hit) and a longer continuation
        prompt = rng.integers(3, VOCAB, size=21).tolist()
        sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
        first = e.generate(input_ids=prompt, sampling_params=sp)
        again = e.generate(input_ids=prompt, sampling_params=sp)
        assert again["output_ids"] == first["output_ids"]
        assert again["meta_info"]["cached_tokens"] > 0
    finally:
        e.shutdown()


def test_deepseek_v2_q_lora_matches_hf(tmp_path_factory):
    """Full-size V2 variant: q low-rank projection path."""
    cfg = transformers.DeepseekV2Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        first_k_dense_replace=1, moe_layer_freq=1,
        routed_scaling_factor=1.0, norm_topk_prob=False,
        topk_method="greedy", n_group=1, topk_group=1,
        kv_lora_rank=32, q_lora_rank=24,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2, rope_scaling=None,
        attention_bias=False,
    )
    torch.manual_seed(1)
    hf = transformers.DeepseekV2ForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("dsv2q")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        prompt = list(np.random.default_rng(5).integers(3, VOCAB, size=13))
        out = e.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True},
        )
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=5, do_sample=False
            )[0][13:].tolist()
        assert out["output_ids"] == ref
    finally:
        e.shutdown()


def test_deepseek_v3_noaux_routing_matches_hf(tmp_path_factory):
    """DeepSeek-V3/R1-class: sigmoid router + e_score_correction_bias +
    group-restricted top-k (HF DeepseekV3TopkRouter) over the MLA trunk."""
    cfg = transformers.DeepseekV3Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        n_group=2, topk_group=1, routed_scaling_factor=2.5,
        norm_topk_prob=True, first_k_dense_replace=1,
        kv_lora_rank=32, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, max_position_embeddings=256,
        tie_word_embeddings=False, torch_dtype="float32", eos_token_id=2,
        rope_scaling=None, attention_bias=False, rope_interleave=True,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = transformers.DeepseekV3ForCausalLM(cfg)
    hf.eval()
    with torch.no_grad():
        for layer in hf.model.layers:
            if hasattr(layer.mlp, "gate"):
                layer.mlp.gate.e_score_correction_bias.uniform_(0.05, 0.5)
    d = tmp_path_factory.mktemp("dsv3")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    try:
        assert e.model_runner.model.is_v3
        rng = np.random.default_rng(7)
        for n in (5, 17):
            p = rng.integers(3, VOCAB, size=n).tolist()
            out = e.generate(
                input_ids=[p],
                sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                                 "ignore_eos": True},
            )
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([p]), max_new_tokens=6, do_sample=False
                )[0][n:].tolist()
            got = out[0]["output_ids"][: len(ref)]
            assert got == ref, (got, ref)
    finally:
        e.shutdown()
