"""SmolLM3 parity vs HF (per-layer NoPE)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def test_smollm3_matches_hf(tmp_path_factory):
    cfg = transformers.SmolLM3Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32",
        eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = transformers.SmolLM3ForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("smollm3")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        # layer 4 (index 3) really is NoPE in this config
        assert float(e.model_runner.model.rope_on[3]) == 0.0
        rng = np.random.default_rng(0)
        for n in (6, 14, 25):
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
            assert got == ref, (got, ref)
    finally:
        e.shutdown()
