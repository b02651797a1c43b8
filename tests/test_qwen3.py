"""Qwen3 (qk-norm) HF-diff parity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine


def test_qwen3_matches_hf(tmp_path_factory):
    if not hasattr(transformers, "Qwen3ForCausalLM"):
        pytest.skip("transformers too old for Qwen3")
    cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.Qwen3ForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("qwen3")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        rng = np.random.default_rng(0)
        for n in (6, 19):
            prompt = rng.integers(3, 128, size=n).tolist()
            out = e.generate(
                input_ids=prompt,
                sampling_params={"max_new_tokens": 5, "temperature": 0.0},
            )
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([prompt]), max_new_tokens=5, do_sample=False
                )[0][n:].tolist()
            assert out["output_ids"] == ref
    finally:
        e.shutdown()
