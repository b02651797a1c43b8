"""Gemma-2 family HF-diff numerics (sandwich norms, softcaps, alternating
sliding window)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def test_gemma2_matches_hf(tmp_path_factory):
    cfg = transformers.Gemma2Config(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,  # exercise both sliding and full layers
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        sliding_window=8,  # small so windowing matters in the test
        query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        torch_dtype="float32",
        eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.Gemma2ForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("gemma2")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    try:
        rng = np.random.default_rng(0)
        # long enough that sliding windows clip context
        for n in (6, 30):
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
    finally:
        e.shutdown()
