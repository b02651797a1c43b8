"""HunYuan-V1 dense parity vs HF (post-rope per-head qk norm)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def test_hunyuan_matches_hf(tmp_path_factory):
    cfg = transformers.HunYuanDenseV1Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256, torch_dtype="float32",
        eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = transformers.HunYuanDenseV1ForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("hunyuan")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        rng = np.random.default_rng(15)
        for n in (5, 17):
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
            assert got == ref, (n, got, ref)
    finally:
        e.shutdown()
