"""compressed-tensors (llm-compressor) checkpoint ingestion.

Builds synthetic ct checkpoints whose quantized values lie EXACTLY on the
quant grid (power-of-two scales), so the engine's greedy output must
match HF `generate` on the equivalent dense (snapped) model token for
token.  Covers the reference's CompressedTensors schemes
(`layers/quantization/compressed_tensors/compressed_tensors.py`):
W8A8-Int8 (dynamic act), W8A16-Int8 weight-only, FP8 weight-only, and
WNA16 pack-quantized int4.
"""

import json
import os
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

LINEAR_KEYS = (
    "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
    "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
)


def _tiny_cfg():
    return transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, torch_dtype="float32",
        eos_token_id=2, tie_word_embeddings=False,
    )


def _quant_config(bits, qtype, strategy, act_dynamic, group_size=None,
                  fmt=None):
    weights = {
        "num_bits": bits, "type": qtype, "symmetric": True,
        "strategy": strategy, "dynamic": False,
    }
    if group_size:
        weights["group_size"] = group_size
    acts = (
        {"num_bits": 8, "type": "int", "symmetric": True,
         "strategy": "token", "dynamic": True}
        if act_dynamic
        else None
    )
    return {
        "quant_method": "compressed-tensors",
        "format": fmt or (
            "float-quantized" if qtype == "float" else "int-quantized"
        ),
        "quantization_status": "compressed",
        "ignore": ["lm_head"],
        "config_groups": {
            "group_0": {
                "targets": ["Linear"],
                "weights": weights,
                "input_activations": acts,
                "output_activations": None,
            }
        },
    }


def _pack_int32(q_signed: np.ndarray) -> np.ndarray:
    """llm-compressor pack_to_int32: signed int4 -> int32, 8/word along
    the last axis, LSB-first."""
    N, K = q_signed.shape
    u = (q_signed.astype(np.int64) & 0xF).reshape(N, K // 8, 8)
    out = np.zeros((N, K // 8), dtype=np.int64)
    for i in range(8):
        out |= u[:, :, i] << (4 * i)
    return out.astype(np.int32)


def _build_ckpts(mode):
    """Returns (ct_dir, dense_dir): ct checkpoint + snapped dense twin."""
    from safetensors.torch import save_file

    cfg = _tiny_cfg()
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    sd = {k: v.clone() for k, v in model.state_dict().items()}
    ct_tensors = {}
    for name in list(sd):
        if not any(name.endswith(f"{lk}.weight") for lk in LINEAR_KEYS):
            ct_tensors[name] = sd[name].float()
            continue
        base = name[: -len(".weight")]
        w = sd[name].float().numpy()  # [N, K]
        N, K = w.shape
        if mode in ("w8a8", "w8a16"):
            s = np.full((N, 1), 2.0 ** -6, np.float32)
            q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
            snapped = q.astype(np.float32) * s
            ct_tensors[name] = torch.tensor(q)
            ct_tensors[base + ".weight_scale"] = torch.tensor(s)
        elif mode == "fp8":
            s = np.full((N, 1), 2.0 ** -3, np.float32)
            qf = (
                torch.tensor(w / s).to(torch.float8_e4m3fn)
            )
            snapped = qf.float().numpy() * s
            ct_tensors[name] = qf
            ct_tensors[base + ".weight_scale"] = torch.tensor(s)
        elif mode == "w4":
            g = 16
            s = np.full((N, K // g), 2.0 ** -4, np.float32)
            q = np.clip(np.round(w / (2.0 ** -4)), -8, 7).astype(np.int8)
            snapped = q.astype(np.float32) * (2.0 ** -4)
            ct_tensors[name.replace(".weight", ".weight_packed")] = (
                torch.tensor(_pack_int32(q))
            )
            ct_tensors[base + ".weight_scale"] = torch.tensor(s)
            ct_tensors[base + ".weight_shape"] = torch.tensor(
                np.asarray([N, K], np.int64)
            )
        sd[name] = torch.tensor(snapped)

    dense_dir = tempfile.mkdtemp(prefix=f"ct_dense_{mode}_")
    model.load_state_dict(sd)
    model.save_pretrained(dense_dir, safe_serialization=True)

    ct_dir = tempfile.mkdtemp(prefix=f"ct_{mode}_")
    cfg_d = json.loads(cfg.to_json_string())
    cfg_d["architectures"] = ["LlamaForCausalLM"]
    if mode == "w8a8":
        cfg_d["quantization_config"] = _quant_config(8, "int", "channel", True)
    elif mode == "w8a16":
        cfg_d["quantization_config"] = _quant_config(8, "int", "channel", False)
    elif mode == "fp8":
        cfg_d["quantization_config"] = _quant_config(8, "float", "channel",
                                                     False)
    else:
        cfg_d["quantization_config"] = _quant_config(
            4, "int", "group", False, group_size=16, fmt="pack-quantized"
        )
    with open(os.path.join(ct_dir, "config.json"), "w") as f:
        json.dump(cfg_d, f)
    save_file(ct_tensors, os.path.join(ct_dir, "model.safetensors"))
    return ct_dir, dense_dir


PROMPTS = [[5, 17, 40, 99, 123], [7, 7, 12, 201]]


def _hf_greedy(dense_dir, max_new=12):
    hf = transformers.LlamaForCausalLM.from_pretrained(dense_dir)
    hf = hf.float().eval()
    refs = []
    with torch.no_grad():
        for pr in PROMPTS:
            refs.append(
                hf.generate(
                    torch.tensor([pr]), max_new_tokens=max_new,
                    do_sample=False,
                )[0][len(pr):].tolist()
            )
    return refs


def _engine_greedy(path, max_new=12, **kw):
    eng = Engine(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, **kw,
    )
    try:
        outs = eng.generate(
            input_ids=PROMPTS,
            sampling_params={
                "max_new_tokens": max_new, "temperature": 0.0,
                "ignore_eos": True,
            },
        )
        return [o["output_ids"] for o in outs]
    finally:
        eng.shutdown()


@pytest.mark.parametrize("mode", ["w8a16", "fp8", "w4"])
def test_ct_weight_only_exact_vs_hf(mode):
    """Weight-only schemes: on-grid weights -> engine == HF exactly."""
    ct_dir, dense_dir = _build_ckpts(mode)
    refs = _hf_greedy(dense_dir)
    got = _engine_greedy(ct_dir, quantization="compressed-tensors")
    assert got == refs, (mode, got, refs)


def test_ct_w8a8_dynamic_matches_w8a8_int8_engine():
    """Dynamic-act int8: same numerics class as --quantization w8a8_int8
    over the snapped dense checkpoint (identical effective weights and
    identical per-token act quant) -> token-exact agreement."""
    ct_dir, dense_dir = _build_ckpts("w8a8")
    got_ct = _engine_greedy(ct_dir, quantization="compressed-tensors")
    got_dense = _engine_greedy(dense_dir, quantization="w8a8_int8")
    assert got_ct == got_dense


def test_ct_detection_fields():
    from sglang_npu_tpu.model_loader.quant_ingest import detect_quant_config

    ct_dir, _ = _build_ckpts("w8a8")
    ct = detect_quant_config(ct_dir)
    assert ct["method"] == "compressed-tensors"
    assert ct["bits"] == 8 and ct["ct_type"] == "int"
    assert ct["ct_act_dynamic"] and ct["ct_act_bits"] == 8
    assert ct["ignore"] == ["lm_head"]


def test_ct_loader_produces_quantized_leaves():
    ct_dir, _ = _build_ckpts("w8a16")
    eng = Engine(
        model_path=ct_dir, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, quantization="compressed-tensors",
    )
    try:
        from sglang_npu_tpu.layers.quantization import QuantizedWeight

        layers = eng.scheduler.runner.params["layers"]
        found = [
            k for k, v in layers.items() if isinstance(v, QuantizedWeight)
        ]
        # qkv/gate-up may be load-time merged at tp=1
        assert "w_down" in found and ("wq" in found or "w_qkv" in found), (
            found
        )
    finally:
        eng.shutdown()
