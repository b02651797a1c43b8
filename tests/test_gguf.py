"""GGUF checkpoint ingestion.

Reference behavior: gguf load format (`srt/model_loader` GGUF path).
No real GGUF files are reachable offline, so the test converts an HF
llama to GGUF exactly the way llama.cpp's convert_hf_to_gguf.py does
(name mapping + rope q/k permutation + Q8_0 block quantization) and
checks the engine loads it back to HF-greedy parity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.model_loader.gguf_loader import (
    gguf_to_hf_config,
    read_gguf,
    write_gguf,
)

VOCAB = 128


def _permute(w: np.ndarray, n_head: int) -> np.ndarray:
    """convert_hf_to_gguf.py's rope permutation of q/k rows."""
    out = w.shape[0]
    return (
        w.reshape(n_head, 2, out // n_head // 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


def _hf_to_gguf(hf, cfg, path, q8=False):
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    heads, kv = cfg.num_attention_heads, cfg.num_key_value_heads
    tensors = {}
    tensors["token_embd.weight"] = sd["model.embed_tokens.weight"]
    tensors["output_norm.weight"] = sd["model.norm.weight"]
    if "lm_head.weight" in sd:
        tensors["output.weight"] = sd["lm_head.weight"]
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        b = f"blk.{i}."
        tensors[b + "attn_q.weight"] = _permute(
            sd[p + "self_attn.q_proj.weight"], heads
        )
        tensors[b + "attn_k.weight"] = _permute(
            sd[p + "self_attn.k_proj.weight"], kv
        )
        tensors[b + "attn_v.weight"] = sd[p + "self_attn.v_proj.weight"]
        tensors[b + "attn_output.weight"] = sd[p + "self_attn.o_proj.weight"]
        tensors[b + "attn_norm.weight"] = sd[p + "input_layernorm.weight"]
        tensors[b + "ffn_norm.weight"] = sd[p + "post_attention_layernorm.weight"]
        tensors[b + "ffn_gate.weight"] = sd[p + "mlp.gate_proj.weight"]
        tensors[b + "ffn_up.weight"] = sd[p + "mlp.up_proj.weight"]
        tensors[b + "ffn_down.weight"] = sd[p + "mlp.down_proj.weight"]
    meta = {
        "general.architecture": "llama",
        "llama.embedding_length": cfg.hidden_size,
        "llama.block_count": cfg.num_hidden_layers,
        "llama.attention.head_count": heads,
        "llama.attention.head_count_kv": kv,
        "llama.feed_forward_length": cfg.intermediate_size,
        "llama.context_length": cfg.max_position_embeddings,
        "llama.attention.layer_norm_rms_epsilon": cfg.rms_norm_eps,
        "llama.rope.freq_base": float(cfg.rope_theta),
        "llama.vocab_size": cfg.vocab_size,
    }
    q8_names = (
        {n for n in tensors if n.endswith((
            "attn_q.weight", "ffn_up.weight"))} if q8 else ()
    )
    write_gguf(path, meta, tensors, q8_names=q8_names)


def _cfg():
    return transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2, rope_theta=10000.0,
    )


def test_gguf_roundtrip_parity(tmp_path):
    cfg = _cfg()
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(cfg)
    hf.eval()
    path = str(tmp_path / "model.gguf")
    _hf_to_gguf(hf, cfg, path)

    meta, tensors = read_gguf(path)
    syn = gguf_to_hf_config(meta, tensor_names=set(tensors))
    assert syn["hidden_size"] == 64 and syn["num_hidden_layers"] == 2
    assert syn["tie_word_embeddings"] is False

    e = Engine(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=1024, attention_backend="xla",
        random_seed=0,
    )
    try:
        rng = np.random.default_rng(0)
        for n in (5, 17):
            prompt = rng.integers(3, VOCAB, size=n).tolist()
            out = e.generate(
                input_ids=[prompt],
                sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                                 "ignore_eos": True},
            )
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([prompt]), max_new_tokens=6, do_sample=False
                )[0][n:].tolist()
            assert out[0]["output_ids"] == ref, (out[0]["output_ids"], ref)
    finally:
        e.shutdown()


def test_gguf_q8_0_dequant_close(tmp_path):
    cfg = _cfg()
    torch.manual_seed(1)
    hf = transformers.LlamaForCausalLM(cfg)
    hf.eval()
    path = str(tmp_path / "model_q8.gguf")
    _hf_to_gguf(hf, cfg, path, q8=True)
    _, tensors = read_gguf(path)
    ref_q = _permute(
        hf.state_dict()["model.layers.0.self_attn.q_proj.weight"]
        .detach().numpy(), cfg.num_attention_heads,
    )
    got = tensors["blk.0.attn_q.weight"]
    rel = np.abs(got - ref_q).max() / np.abs(ref_q).max()
    assert rel < 0.02, rel  # int8 block quantization error bound

    # and it still serves (numerics within quantization noise)
    e = Engine(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=1024, attention_backend="xla",
        random_seed=0,
    )
    try:
        out = e.generate(
            input_ids=[[5, 9, 11, 7]],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert len(out[0]["output_ids"]) == 4
    finally:
        e.shutdown()


def test_gguf_unsupported_quant_rejected(tmp_path):
    import struct

    # hand-craft a header with a K-quant tensor type (12 = Q4_K-ish)
    path = str(tmp_path / "bad.gguf")
    from sglang_npu_tpu.model_loader.gguf_loader import MAGIC

    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<Q", 1))  # tensors
        f.write(struct.pack("<Q", 0))  # kv
        name = b"token_embd.weight"
        f.write(struct.pack("<Q", len(name)))
        f.write(name)
        f.write(struct.pack("<I", 2))
        f.write(struct.pack("<Q", 32))
        f.write(struct.pack("<Q", 32))
        f.write(struct.pack("<I", 12))  # unsupported ggml type
        f.write(struct.pack("<Q", 0))
        f.write(b"\0" * 4096)
    with pytest.raises(ValueError, match="not supported"):
        read_gguf(path)
