"""Gemma-3n greedy parity vs HF: AltUp predict/correct, LAuReL,
per-layer inputs, KV sharing (q-only shared layers), sliding/full mix
with dual rope, activation sparsity, scale-free v-norm, logit softcap
(reference `srt/models/gemma3n_causal.py`; HF `modeling_gemma3n.py`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 160


def _make(tmp, **kw):
    cfg = transformers.Gemma3nTextConfig(
        vocab_size=VOCAB, vocab_size_per_layer_input=VOCAB,
        hidden_size=64, hidden_size_per_layer_input=16,
        intermediate_size=[96] * 6, num_hidden_layers=6,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        altup_num_inputs=4, altup_active_idx=0, altup_coef_clip=120.0,
        altup_correct_scale=True, laurel_rank=8,
        layer_types=[
            "sliding_attention", "sliding_attention", "full_attention",
            "sliding_attention", "sliding_attention", "full_attention",
        ],
        sliding_window=8, rope_theta=1000000.0,
        rope_local_base_freq=10000.0,
        activation_sparsity_pattern=[0.95, 0.95, 0.0, 0.0, 0.0, 0.0],
        final_logit_softcapping=30.0,
        max_position_embeddings=256, torch_dtype="float32",
        eos_token_id=1, pad_token_id=0, bos_token_id=2,
        tie_word_embeddings=True,
        **kw,
    )
    torch.manual_seed(0)
    hf = transformers.Gemma3nForCausalLM(cfg)
    hf.eval()
    hf.save_pretrained(tmp, safe_serialization=True)
    return hf, cfg


@pytest.mark.parametrize("shared", [0, 2])
def test_gemma3n_matches_hf(tmp_path_factory, shared):
    d = tmp_path_factory.mktemp(f"gemma3n_{shared}")
    hf, cfg = _make(d, num_kv_shared_layers=shared)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        rng = np.random.default_rng(0)
        # n=21 > sliding_window=8 exercises the windowed mask; the
        # shared=2 case puts one sliding + one full layer on q-only KV
        for n in (5, 21):
            p = rng.integers(3, VOCAB, size=n).tolist()
            out = e.generate(
                input_ids=[p],
                sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                                 "ignore_eos": True},
            )
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([p]), max_new_tokens=8, do_sample=False,
                    eos_token_id=None, pad_token_id=0,
                )[0][n:].tolist()
            got = out[0]["output_ids"][: len(ref)]
            assert got == ref, (shared, n, got, ref)
    finally:
        e.shutdown()
