"""DeepSeek NextN (MTP) speculative decoding: losslessness.

Reference behaviors: `srt/models/deepseek_nextn.py` (DeepseekModelNextN
— enorm/hnorm/eh_proj + one decoder layer + shared_head.norm),
`srt/speculative/eagle_worker.py` (draft/verify round driven by the
same EAGLE machinery).

The draft head here is random, so acceptance is near zero — but greedy
output must STILL exactly match the target-only decoding (the lossless
property of speculative decoding), through the MLA latent-pool verify
and latent commit paths."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from safetensors.numpy import save_file

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128
D = 64
KV_RANK = 32
NOPE = 16
ROPE = 8
VDIM = 16
HEADS = 4
MOE_INTER = 48
EXPERTS = 4


def ds_cfg(layers):
    return transformers.DeepseekV2Config(
        vocab_size=VOCAB, hidden_size=D, intermediate_size=96,
        moe_intermediate_size=MOE_INTER, num_hidden_layers=layers,
        num_attention_heads=HEADS, num_key_value_heads=HEADS,
        n_routed_experts=EXPERTS, n_shared_experts=1,
        num_experts_per_tok=2, first_k_dense_replace=1, moe_layer_freq=1,
        routed_scaling_factor=1.0, norm_topk_prob=False,
        topk_method="greedy", n_group=1, topk_group=1,
        kv_lora_rank=KV_RANK, q_lora_rank=None, qk_nope_head_dim=NOPE,
        qk_rope_head_dim=ROPE, v_head_dim=VDIM,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2, rope_scaling=None,
        attention_bias=False,
    )


def mk_nextn_draft(d, seed=1):
    """Standalone extracted NextN draft: num_hidden_layers == 1, weights
    at model.layers.0.* (reference `deepseek_v2.py:load_weights`
    'old design' convention)."""
    cfg = ds_cfg(layers=1).to_dict()
    cfg["num_nextn_predict_layers"] = 1
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f, default=str)
    rng = np.random.default_rng(seed)

    def r(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    pre = "model.layers.0."
    t = {
        pre + "enorm.weight": np.ones(D, np.float32),
        pre + "hnorm.weight": np.ones(D, np.float32),
        pre + "eh_proj.weight": r(D, 2 * D),
        pre + "shared_head.norm.weight": np.ones(D, np.float32),
        pre + "input_layernorm.weight": np.ones(D, np.float32),
        pre + "post_attention_layernorm.weight": np.ones(D, np.float32),
        pre + "self_attn.kv_a_proj_with_mqa.weight": r(KV_RANK + ROPE, D),
        pre + "self_attn.kv_a_layernorm.weight": np.ones(KV_RANK, np.float32),
        pre + "self_attn.kv_b_proj.weight": r(HEADS * (NOPE + VDIM), KV_RANK),
        pre + "self_attn.q_proj.weight": r(HEADS * (NOPE + ROPE), D),
        pre + "self_attn.o_proj.weight": r(D, HEADS * VDIM),
        pre + "mlp.gate.weight": r(EXPERTS, D),
        pre + "mlp.shared_experts.gate_proj.weight": r(MOE_INTER, D),
        pre + "mlp.shared_experts.up_proj.weight": r(MOE_INTER, D),
        pre + "mlp.shared_experts.down_proj.weight": r(D, MOE_INTER),
    }
    for e in range(EXPERTS):
        t[pre + f"mlp.experts.{e}.gate_proj.weight"] = r(MOE_INTER, D)
        t[pre + f"mlp.experts.{e}.up_proj.weight"] = r(MOE_INTER, D)
        t[pre + f"mlp.experts.{e}.down_proj.weight"] = r(D, MOE_INTER)
    save_file(t, os.path.join(d, "model.safetensors"))


@pytest.fixture(scope="module")
def nextn_setup(tmp_path_factory):
    dt = tmp_path_factory.mktemp("nextn_target")
    dd = tmp_path_factory.mktemp("nextn_draft")
    torch.manual_seed(0)
    target = transformers.DeepseekV2ForCausalLM(ds_cfg(layers=2))
    target.eval()
    # mirror the engine's ignore_eos: HF must not early-stop on token 2
    target.generation_config.eos_token_id = None
    target.save_pretrained(dt, safe_serialization=True)
    mk_nextn_draft(dd)
    e = Engine(
        model_path=str(dt), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
        speculative_algorithm="NEXTN",
        speculative_draft_model_path=str(dd),
        speculative_num_steps=2,
        speculative_eagle_topk=2,
    )
    yield e, target
    e.shutdown()


def test_nextn_uses_latent_draft_pool(nextn_setup):
    engine, _ = nextn_setup
    from sglang_npu_tpu.ops.mla_attention import MLALatentPool

    assert engine.eagle_runner is not None
    assert engine.eagle_runner.is_mtp
    assert isinstance(engine.eagle_runner.kv_pool, MLALatentPool)
    assert engine.eagle_runner.kv_pool.ckv.shape[0] == 1  # one MTP layer
    assert engine.eagle_runner.target_is_mla


def test_nextn_lossless(nextn_setup):
    engine, target = nextn_setup
    rng = np.random.default_rng(0)
    for n in (5, 17, 30):
        prompt = rng.integers(3, VOCAB, size=n).tolist()
        out = engine.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 12, "temperature": 0.0,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            ref = target.generate(
                torch.tensor([prompt]), max_new_tokens=12, do_sample=False
            )[0][n:].tolist()
        assert out["output_ids"] == ref, (n, out["output_ids"], ref)


def test_nextn_chunked_prefill_and_prefix(nextn_setup):
    engine, target = nextn_setup
    rng = np.random.default_rng(9)
    prompt = rng.integers(3, VOCAB, size=70).tolist()
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
    out1 = engine.generate(input_ids=prompt, sampling_params=sp)
    with torch.no_grad():
        ref = target.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False
        )[0][70:].tolist()
    assert out1["output_ids"] == ref
    out2 = engine.generate(input_ids=prompt, sampling_params=sp)  # radix hit
    assert out2["output_ids"] == ref
