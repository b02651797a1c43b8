"""MiMo (Qwen2 trunk + MTP draft) and MiniCPM3 (MLA-lite + muP) parity.

Oracles: transformers Qwen2 for the MiMo trunk (reference
`srt/models/mimo.py` IS the Qwen2 trunk); transformers DeepseekV2 with
the muP scalars FOLDED INTO ITS WEIGHTS for MiniCPM3 (scale_emb folds
into the embedding, scale_depth/sqrt(L) into o_proj/down_proj, the
logits divisor into lm_head — all exact linear folds), since MiniCPM3 is
remote-code on HF.  MiMo-MTP losslessness follows test_nextn: a random
draft head must not change greedy output."""

import json
import math
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
st = pytest.importorskip("safetensors.torch")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128
SP = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
PROMPT = list(np.random.default_rng(9).integers(3, VOCAB, size=9))

pytestmark = pytest.mark.fast


def _greedy(path, prompt, **kw):
    e = Engine(
        model_path=str(path), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, **kw,
    )
    try:
        out = e.generate(input_ids=[prompt], sampling_params=SP)
        return out[0]["output_ids"][: SP["max_new_tokens"]]
    finally:
        e.shutdown()


def test_mimo_trunk(tmp_path):
    cfg = transformers.Qwen2Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        tie_word_embeddings=False, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    m = transformers.Qwen2ForCausalLM(cfg)
    m.eval()
    cd = cfg.to_dict()
    cd["architectures"] = ["MiMoForCausalLM"]
    cd["model_type"] = "mimo"
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cd, f)
    st.save_file(
        {k: v.contiguous() for k, v in m.state_dict().items()},
        str(tmp_path / "model.safetensors"),
    )
    got = _greedy(tmp_path, PROMPT)
    with torch.no_grad():
        ref = m.generate(
            torch.tensor([PROMPT]), max_new_tokens=SP["max_new_tokens"],
            do_sample=False,
        )[0][len(PROMPT):].tolist()
    assert got == ref


def test_minicpm3(tmp_path):
    L = 3
    cfg = transformers.DeepseekV2Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        num_hidden_layers=L, num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=4, moe_intermediate_size=32,
        num_experts_per_tok=2, moe_layer_freq=1,
        first_k_dense_replace=L,  # all layers dense (minicpm3 is dense)
        kv_lora_rank=32, q_lora_rank=24,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2, rope_scaling=None,
        attention_bias=False,
    )
    torch.manual_seed(2)
    m = transformers.DeepseekV2ForCausalLM(cfg)
    m.eval()
    sd = {k: v.clone() for k, v in m.state_dict().items()}

    scale_emb, scale_depth, dim_model_base = 4.0, 1.4, 32
    rm = scale_depth / math.sqrt(L)
    width = cfg.hidden_size / dim_model_base
    # fold the muP scalars into the ORACLE's weights (exact linear folds)
    with torch.no_grad():
        m.model.embed_tokens.weight.mul_(scale_emb)
        for layer in m.model.layers:
            layer.self_attn.o_proj.weight.mul_(rm)
            layer.mlp.down_proj.weight.mul_(rm)
        m.lm_head.weight.mul_(1.0 / width)

    cd = cfg.to_dict()
    cd["architectures"] = ["MiniCPM3ForCausalLM"]
    cd["model_type"] = "minicpm3"
    cd["scale_emb"] = scale_emb
    cd["scale_depth"] = scale_depth
    cd["dim_model_base"] = dim_model_base
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cd, f, default=str)
    st.save_file(
        {k: v.contiguous() for k, v in sd.items()},
        str(tmp_path / "model.safetensors"),
    )
    got = _greedy(tmp_path, PROMPT)
    with torch.no_grad():
        ref = m.generate(
            torch.tensor([PROMPT]), max_new_tokens=SP["max_new_tokens"],
            do_sample=False,
        )[0][len(PROMPT):].tolist()
    assert got == ref


def test_mimo_mtp_lossless(tmp_path):
    """Speculative NEXTN with the MiMo MTP head: greedy output must match
    target-only decoding exactly (lossless), even with a random draft."""
    cfg = transformers.Qwen2Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        tie_word_embeddings=False, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(4)
    m = transformers.Qwen2ForCausalLM(cfg)
    tgt = tmp_path / "target"
    tgt.mkdir()
    cd = cfg.to_dict()
    cd["architectures"] = ["MiMoForCausalLM"]
    cd["model_type"] = "mimo"
    with open(tgt / "config.json", "w") as f:
        json.dump(cd, f)
    st.save_file(
        {k: v.contiguous() for k, v in m.state_dict().items()},
        str(tgt / "model.safetensors"),
    )

    draft = tmp_path / "draft"
    draft.mkdir()
    dcfg = dict(cd)
    dcfg["architectures"] = ["MiMoMTP"]
    dcfg["num_hidden_layers"] = 1
    dcfg["num_nextn_predict_layers"] = 1
    with open(draft / "config.json", "w") as f:
        json.dump(dcfg, f)
    rng = np.random.default_rng(5)

    def r(*shape):
        return torch.tensor(
            (rng.standard_normal(shape) * 0.05).astype(np.float32)
        )

    D, H, KV, hd, F = 64, 4, 2, 16, 96
    pre = "model.mtp_layers.0."
    t = {
        pre + "token_layernorm.weight": torch.ones(D),
        pre + "hidden_layernorm.weight": torch.ones(D),
        pre + "input_proj.weight": r(D, 2 * D),
        pre + "final_layernorm.weight": torch.ones(D),
        pre + "input_layernorm.weight": torch.ones(D),
        pre + "post_attention_layernorm.weight": torch.ones(D),
        pre + "self_attn.q_proj.weight": r(H * hd, D),
        pre + "self_attn.q_proj.bias": r(H * hd),
        pre + "self_attn.k_proj.weight": r(KV * hd, D),
        pre + "self_attn.k_proj.bias": r(KV * hd),
        pre + "self_attn.v_proj.weight": r(KV * hd, D),
        pre + "self_attn.v_proj.bias": r(KV * hd),
        pre + "self_attn.o_proj.weight": r(D, H * hd),
        pre + "mlp.gate_proj.weight": r(F, D),
        pre + "mlp.up_proj.weight": r(F, D),
        pre + "mlp.down_proj.weight": r(D, F),
    }
    st.save_file({k: v.contiguous() for k, v in t.items()},
                 str(draft / "model.safetensors"))

    base = _greedy(tgt, PROMPT)
    spec = _greedy(
        tgt, PROMPT,
        speculative_algorithm="NEXTN",
        speculative_draft_model_path=str(draft),
        speculative_num_steps=2,
        speculative_eagle_topk=1,
        speculative_num_draft_tokens=3,
    )
    assert spec == base, (spec, base)
