"""Llama-4 parity vs HF: NoPE layers, interleaved rope, L2 qk-norm,
attention temperature tuning, chunked attention, interleaved dense/MoE
with input-scaled routed experts + shared expert."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def _make(tmp, **kw):
    cfg = transformers.Llama4TextConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        intermediate_size_mlp=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256, torch_dtype="float32",
        eos_token_id=2, pad_token_id=0, bos_token_id=1,
        attention_chunk_size=16, use_qk_norm=True,
        attn_temperature_tuning=True, floor_scale=8.0, attn_scale=0.1,
        **kw,
    )
    torch.manual_seed(0)
    hf = transformers.Llama4ForCausalLM(cfg)
    hf.eval()
    hf.save_pretrained(tmp, safe_serialization=True)
    return hf, cfg


@pytest.mark.parametrize("step", [1, 2])
def test_llama4_matches_hf(tmp_path_factory, step):
    d = tmp_path_factory.mktemp(f"llama4_{step}")
    hf, cfg = _make(d, interleave_moe_layer_step=step)
    # config sanity: layer 3 is NoPE; step=2 leaves layers 0/2 dense
    assert cfg.no_rope_layers[3] == 0
    if step == 2:
        assert 0 not in cfg.moe_layers and 1 in cfg.moe_layers
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        rng = np.random.default_rng(0)
        # n=25 > attention_chunk_size=16 exercises the chunked mask and
        # (with floor_scale=8) several temperature-tuning plateaus
        for n in (6, 25):
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
            assert got == ref, (step, n, got, ref)
    finally:
        e.shutdown()
