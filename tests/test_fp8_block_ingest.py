"""Blockwise-FP8 (128x128) checkpoint ingestion — the native
DeepSeek-V3/R1 weight format (reference `layers/quantization/fp8.py`
blockwise path + `fp8_kernel.py`).

Builds a tiny llama checkpoint whose linears are stored as fp8 `.weight`
+ f32 `.weight_scale_inv` (quantization_config.weight_block_size), then:
  1. unit: the loaded QuantizedWeightFP8Block dequantizes to exactly the
     host-side explicit dequant;
  2. e2e: engine greedy output matches HF running the explicitly
     dequantized checkpoint.
"""

import json
import os

import numpy as np
import pytest
import torch
import transformers

BLOCK = 32  # small model: exercise non-divisible edges too


def _blockwise_quant(w: torch.Tensor, block=BLOCK):
    """w [out, in] -> (q fp8 [out, in], scale_inv f32 [ceil(out/b), ceil(in/b)])."""
    O, I = w.shape
    ob, ib = -(-O // block), -(-I // block)
    q = torch.zeros_like(w, dtype=torch.float8_e4m3fn)
    s = torch.zeros(ob, ib, dtype=torch.float32)
    for r in range(ob):
        for c in range(ib):
            blk = w[r * block : (r + 1) * block, c * block : (c + 1) * block]
            amax = blk.abs().max().clamp(min=1e-12)
            scale = (amax / 448.0).to(torch.float32)
            s[r, c] = scale
            q[r * block : (r + 1) * block, c * block : (c + 1) * block] = (
                blk / scale
            ).to(torch.float8_e4m3fn)
    return q, s


@pytest.fixture(scope="module")
def fp8_ckpt(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    d = tmp_path_factory.mktemp("fp8_block")

    sd = model.state_dict()
    out = {}
    deq_sd = {}
    lin_suffixes = (
        "q_proj.weight", "k_proj.weight", "v_proj.weight", "o_proj.weight",
        "gate_proj.weight", "up_proj.weight", "down_proj.weight",
    )
    for name, t in sd.items():
        if any(name.endswith(sfx) for sfx in lin_suffixes):
            q, s = _blockwise_quant(t.to(torch.float32))
            out[name] = q
            out[name + "_scale_inv"] = s
            # explicit dequant for the HF reference
            sb = s.repeat_interleave(BLOCK, 0)[: t.shape[0]]
            sb = sb.repeat_interleave(BLOCK, 1)[:, : t.shape[1]]
            deq_sd[name] = q.to(torch.float32) * sb
        else:
            out[name] = t
            deq_sd[name] = t
    from safetensors.torch import save_file

    save_file(out, os.path.join(d, "model.safetensors"))
    hf_cfg = json.loads(cfg.to_json_string())
    hf_cfg["quantization_config"] = {
        "quant_method": "fp8",
        "fmt": "e4m3",
        "activation_scheme": "dynamic",
        "weight_block_size": [BLOCK, BLOCK],
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(hf_cfg, f)

    ref = transformers.LlamaForCausalLM(cfg)
    ref.load_state_dict(deq_sd)
    return str(d), ref, sd


def test_ingest_matches_explicit_dequant(fp8_ckpt):
    d, ref, sd = fp8_ckpt
    import jax.numpy as jnp

    from sglang_npu_tpu.configs.model_config import ModelConfig
    from sglang_npu_tpu.layers.quantization import (
        QuantizedWeightFP8Block,
        dequant,
    )
    from sglang_npu_tpu.model_loader.loader import load_safetensors_weights
    from sglang_npu_tpu.models.llama import LlamaForCausalLM as JaxLlama

    mc = ModelConfig.from_model_path(d)
    model = JaxLlama(mc)
    host = load_safetensors_weights(model, d)
    wq = host["layers"]["wq"]
    assert isinstance(wq, dict) and wq.get("__fp8b__")
    got = np.asarray(
        dequant(
            QuantizedWeightFP8Block(
                q=jnp.asarray(wq["q"]), s=jnp.asarray(wq["s"])
            ),
            jnp.float32,
        )[0]
    )
    want = np.asarray(
        ref.model.layers[0].self_attn.q_proj.weight.detach().to(torch.float32)
    ).T
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)


def test_fp8_block_engine_greedy_parity(fp8_ckpt):
    d, ref, _sd = fp8_ckpt
    import sglang_npu_tpu as sgl

    eng = sgl.Engine(
        model_path=d, dtype="float32", page_size=4, max_total_tokens=2048,
        attention_backend="xla", tokenizer_mode="byte", random_seed=0,
    )
    try:
        prompt = "The quick brown fox"
        out = eng.generate(
            prompt,
            {"max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True},
        )
        ids = torch.tensor([[*prompt.encode()]])
        hf_out = ref.generate(ids, max_new_tokens=10, do_sample=False)[
            0, ids.shape[1]:
        ].tolist()
        assert out["output_ids"] == hf_out
    finally:
        eng.shutdown()
