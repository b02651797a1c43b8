"""EAGLE3 speculative decoding: aux-hidden conditioning, dual-norm
midlayer, draft-vocab d2t mapping — losslessness and acceptance.

Reference behaviors: `srt/models/llama_eagle3.py` (fc over 3 aux target
hiddens, concat(input_layernorm(embed), hidden_norm(hidden)) attention
input, draft lm_head over draft_vocab_size with d2t diff mapping) and
`srt/models/llama.py:329,748` (aux hidden capture).

Fixtures:
  * a "constant" pair — the target's lm_head is all zeros so greedy
    argmax is always token 0, and the draft's final norm is zero so its
    draft-vocab argmax is draft id 0, mapped to target id 0 by d2t:
    every draft token is accepted (exercises the full commit path).
  * a random eagle3 draft over a 4-layer target — near-zero acceptance,
    but output must STILL match HF greedy exactly (lossless property,
    and proof the aux capture does not perturb the target forward).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from safetensors.numpy import save_file

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128
DRAFT_VOCAB = 64
D = 64


def mk_target(d, seed=0, layers=2, zero_head=False):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=D, intermediate_size=128,
        num_hidden_layers=layers, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=512,
        tie_word_embeddings=False, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(seed)
    m = transformers.LlamaForCausalLM(cfg)
    if zero_head:
        with torch.no_grad():
            m.lm_head.weight.zero_()  # greedy argmax == token 0 everywhere
    m.save_pretrained(d, safe_serialization=True)
    return m


def mk_eagle3_draft(d, target_layers, constant=False, seed=1, aux_ids=None):
    cfg = {
        "architectures": ["LlamaForCausalLMEagle3"],
        "model_type": "llama",
        "vocab_size": VOCAB,
        "draft_vocab_size": DRAFT_VOCAB,
        "hidden_size": D,
        "intermediate_size": 128,
        "num_hidden_layers": 1,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "max_position_embeddings": 512,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "torch_dtype": "float32",
    }
    if aux_ids is not None:
        cfg["eagle_aux_hidden_state_layer_ids"] = aux_ids
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    rng = np.random.default_rng(seed)

    def r(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    tensors = {
        "model.embed_tokens.weight": r(VOCAB, D),
        "model.fc.weight": r(D, 3 * D),
        "model.norm.weight": (
            np.zeros(D, np.float32) if constant else np.ones(D, np.float32)
        ),
        "lm_head.weight": r(DRAFT_VOCAB, D),
        "d2t": np.zeros(DRAFT_VOCAB, np.int64),
        "model.midlayer.input_layernorm.weight": np.ones(D, np.float32),
        "model.midlayer.hidden_norm.weight": np.ones(D, np.float32),
        "model.midlayer.post_attention_layernorm.weight": np.ones(
            D, np.float32
        ),
        "model.midlayer.self_attn.q_proj.weight": r(D, 2 * D),
        "model.midlayer.self_attn.k_proj.weight": r(D // 2, 2 * D),
        "model.midlayer.self_attn.v_proj.weight": r(D // 2, 2 * D),
        "model.midlayer.self_attn.o_proj.weight": r(D, D),
        "model.midlayer.mlp.gate_proj.weight": r(128, D),
        "model.midlayer.mlp.up_proj.weight": r(128, D),
        "model.midlayer.mlp.down_proj.weight": r(D, 128),
    }
    save_file(tensors, os.path.join(d, "model.safetensors"))


def make_engine(target_dir, draft_dir, **kw):
    return Engine(
        model_path=str(target_dir), dtype="float32",
        skip_tokenizer_init=True, page_size=4, max_total_tokens=8192,
        attention_backend="xla", random_seed=0,
        speculative_algorithm="EAGLE3",
        speculative_draft_model_path=str(draft_dir),
        speculative_num_steps=3,
        speculative_eagle_topk=2,
        **kw,
    )


def test_eagle3_constant_full_acceptance(tmp_path_factory):
    dt = tmp_path_factory.mktemp("e3_target_c")
    dd = tmp_path_factory.mktemp("e3_draft_c")
    target = mk_target(dt, seed=0, layers=2, zero_head=True)
    mk_eagle3_draft(dd, 2, constant=True)
    e = make_engine(dt, dd)
    try:
        rng = np.random.default_rng(0)
        prompt = rng.integers(3, VOCAB, size=9).tolist()
        out = e.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 12, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert out["output_ids"] == [0] * 12, out["output_ids"]
        accepted = out["meta_info"].get("spec_accepted_tokens", 0)
        assert accepted >= len(out["output_ids"]) // 2, out["meta_info"]
    finally:
        e.shutdown()


def test_eagle3_random_draft_lossless(tmp_path_factory):
    dt = tmp_path_factory.mktemp("e3_target_r")
    dd = tmp_path_factory.mktemp("e3_draft_r")
    target = mk_target(dt, seed=3, layers=4)
    mk_eagle3_draft(dd, 4, constant=False, aux_ids=[0, 1, 3])
    e = make_engine(dt, dd)
    try:
        rng = np.random.default_rng(1)
        for n in (6, 23, 70):
            prompt = rng.integers(3, VOCAB, size=n).tolist()
            out = e.generate(
                input_ids=prompt,
                sampling_params={"max_new_tokens": 10, "temperature": 0.0,
                                 "ignore_eos": True},
            )
            with torch.no_grad():
                ref = target.generate(
                    torch.tensor([prompt]), max_new_tokens=10,
                    do_sample=False,
                )[0][n:].tolist()
            assert out["output_ids"] == ref, (n, out["output_ids"], ref)
    finally:
        e.shutdown()


def test_eagle3_d2t_mapping_unit():
    """d2t diff mapping: draft id i -> target id i + d2t[i]."""
    import jax.numpy as jnp

    from sglang_npu_tpu.configs.model_config import ModelConfig
    from sglang_npu_tpu.models.llama_eagle import Eagle3DraftModel

    cfg = ModelConfig.from_hf_dict(
        {
            "architectures": ["LlamaForCausalLMEagle3"],
            "model_type": "llama",
            "vocab_size": VOCAB, "draft_vocab_size": DRAFT_VOCAB,
            "hidden_size": D, "intermediate_size": 128,
            "num_hidden_layers": 1, "num_attention_heads": 4,
            "num_key_value_heads": 2, "max_position_embeddings": 512,
        },
        dtype="float32",
    )
    m = Eagle3DraftModel(cfg)
    d2t = jnp.asarray(np.arange(DRAFT_VOCAB), jnp.int32)
    out = m.map_draft_ids({"d2t": d2t}, jnp.asarray([0, 3, 10]))
    assert out.tolist() == [0, 6, 20]
