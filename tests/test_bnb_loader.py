"""bitsandbytes NF4 checkpoint ingestion (reference BitsAndBytesModelLoader,
loader.py:765).

bitsandbytes is not installed here, so the fixture quantizes a tiny llama
with a from-scratch NF4 quantizer writing the exact bnb tensor layout
(packed high-nibble-first codes, blockwise absmax double-quantized through
a nested 8-bit codebook, serialized-JSON quant_state sidecar).  The loader
must invert it: greedy generation from the bnb checkpoint must equal
generation from a dense checkpoint holding the dequantized weights.
"""

import json
import os
import tempfile

import numpy as np
import pytest

from sglang_npu_tpu.model_loader.bnb_loader import (
    NF4_CODE,
    dequantize_bnb_tensor,
)

BLOCK = 64
NESTED_BLOCK = 256


def _nearest(code: np.ndarray, vals: np.ndarray) -> np.ndarray:
    return np.abs(vals[:, None] - code[None, :]).argmin(axis=1).astype(np.uint8)


def quantize_nf4(w: np.ndarray):
    """Returns (tensors dict in bnb layout, dequantized reference)."""
    shape = list(w.shape)
    flat = w.reshape(-1).astype(np.float32)
    n = flat.size
    pad = (-n) % BLOCK
    flat = np.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    absmax = np.abs(blocks).max(axis=1)
    absmax = np.where(absmax == 0, 1.0, absmax).astype(np.float32)
    normed = blocks / absmax[:, None]
    codes = _nearest(NF4_CODE, normed.reshape(-1))
    packed = ((codes[0::2] << 4) | codes[1::2]).astype(np.uint8)

    # double-quantize absmax: offset + nested 8-bit blockwise codebook
    offset = np.float32(absmax.mean())
    a = absmax - offset
    npad = (-a.size) % NESTED_BLOCK
    a_p = np.pad(a, (0, npad)).reshape(-1, NESTED_BLOCK)
    nested_absmax = np.abs(a_p).max(axis=1)
    nested_absmax = np.where(nested_absmax == 0, 1.0, nested_absmax).astype(
        np.float32
    )
    nested_map = np.linspace(-1.0, 1.0, 256).astype(np.float32)
    a_norm = (a_p / nested_absmax[:, None]).reshape(-1)[: a.size]
    a_codes = _nearest(nested_map, a_norm)

    state = {
        "quant_type": "nf4",
        "blocksize": BLOCK,
        "shape": shape,
        "dtype": "bfloat16",
        "nested_blocksize": NESTED_BLOCK,
        "nested_offset": float(offset),
        "nested_dtype": "float32",
    }
    state_bytes = np.frombuffer(
        json.dumps(state).encode("utf-8"), dtype=np.uint8
    ).copy()

    tensors = {
        "weight": packed.reshape(-1, 1),
        "absmax": a_codes,
        "quant_map": NF4_CODE.copy(),
        "nested_absmax": nested_absmax,
        "nested_quant_map": nested_map,
        "quant_state.bitsandbytes__nf4": state_bytes,
    }

    # reference dequant (ground truth for the loader)
    scale = np.repeat(
        nested_map[a_codes]
        * np.repeat(nested_absmax, NESTED_BLOCK)[: a.size]
        + offset,
        BLOCK,
    )
    un = np.empty(packed.size * 2, dtype=np.float32)
    un[0::2] = NF4_CODE[packed >> 4]
    un[1::2] = NF4_CODE[packed & 0xF]
    dense = (un * scale)[:n].reshape(shape)
    return tensors, dense


def test_dequantize_roundtrip_unit():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((48, 80)).astype(np.float32)
    tensors, want = quantize_nf4(w)
    got = dequantize_bnb_tensor(tensors)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # quantization error is bounded (sanity that the fixture is sane)
    assert np.abs(got - w).max() < 0.5


LINEAR_SUFFIXES = (
    "self_attn.q_proj.weight",
    "self_attn.k_proj.weight",
    "self_attn.v_proj.weight",
    "self_attn.o_proj.weight",
    "mlp.gate_proj.weight",
    "mlp.up_proj.weight",
    "mlp.down_proj.weight",
)


@pytest.fixture(scope="module")
def bnb_and_dense_ckpts():
    import torch
    import transformers
    from safetensors.torch import load_file, save_file

    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, eos_token_id=2, torch_dtype="float32",
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    dense_dir = tempfile.mkdtemp(prefix="bnb_dense_")
    bnb_dir = tempfile.mkdtemp(prefix="bnb_q_")
    model.save_pretrained(dense_dir, safe_serialization=True)

    sd = load_file(os.path.join(dense_dir, "model.safetensors"))
    out = {}
    dequantized = {}
    for name, t in sd.items():
        if any(name.endswith(s) for s in LINEAR_SUFFIXES):
            tensors, dense = quantize_nf4(t.numpy())
            for suf, arr in tensors.items():
                key = name if suf == "weight" else f"{name}.{suf}"
                out[key] = torch.from_numpy(np.ascontiguousarray(arr))
            dequantized[name] = torch.from_numpy(dense.astype(np.float32))
        else:
            out[name] = t
    save_file(out, os.path.join(bnb_dir, "model.safetensors"))
    with open(os.path.join(dense_dir, "config.json")) as f:
        cfg_json = json.load(f)
    cfg_json["quantization_config"] = {
        "quant_method": "bitsandbytes",
        "load_in_4bit": True,
        "bnb_4bit_quant_type": "nf4",
        "bnb_4bit_use_double_quant": True,
        "bnb_4bit_compute_dtype": "bfloat16",
    }
    with open(os.path.join(bnb_dir, "config.json"), "w") as f:
        json.dump(cfg_json, f)

    # dense twin holding the dequantized values (ground truth engine)
    sd.update(dequantized)
    save_file(sd, os.path.join(dense_dir, "model.safetensors"))
    return bnb_dir, dense_dir


def test_bnb_engine_matches_dequantized_dense(bnb_and_dense_ckpts):
    import sglang_npu_tpu as sgl

    bnb_dir, dense_dir = bnb_and_dense_ckpts
    outs = []
    for path in (bnb_dir, dense_dir):
        eng = sgl.Engine(
            model_path=path, dtype="float32", page_size=4,
            max_total_tokens=2048, attention_backend="xla",
            tokenizer_mode="byte", random_seed=0,
        )
        out = eng.generate(
            "The capital of France",
            {"max_new_tokens": 16, "temperature": 0.0, "ignore_eos": True},
        )
        outs.append(out["output_ids"])
        eng.shutdown()
    assert outs[0] == outs[1]
