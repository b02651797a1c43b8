"""Gemma (v1) greedy parity and Roberta embedding/reranker parity vs HF.

Reference behavior: `srt/models/gemma.py` (scaled embeddings, (1+w)
RMSNorm, GeGLU) and `srt/models/roberta.py` (offset position rows;
XLMRobertaForSequenceClassification first-token classification head).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def test_gemma1_matches_hf(tmp_path_factory):
    cfg = transformers.GemmaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, hidden_activation="gelu_pytorch_tanh",
        max_position_embeddings=256, rms_norm_eps=1e-6,
        torch_dtype="float32", eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = transformers.GemmaForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("gemma1")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        rng = np.random.default_rng(3)
        for n in (4, 19):
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


def test_roberta_embeddings_match_hf(tmp_path_factory):
    cfg = transformers.RobertaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=80, type_vocab_size=1,
        pad_token_id=1, torch_dtype="float32",
    )
    torch.manual_seed(0)
    hf = transformers.RobertaModel(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("roberta")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=1024, attention_backend="xla",
        random_seed=0, is_embedding=True,
    )
    try:
        rng = np.random.default_rng(1)
        for n in (6, 17):
            ids = rng.integers(3, VOCAB, size=n).tolist()
            out = e.encode(input_ids=ids)
            mine = np.asarray(out["embedding"])
            with torch.no_grad():
                hidden = hf(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(1, n, dtype=torch.long),
                ).last_hidden_state[0].numpy()
            ref = hidden.mean(0)
            ref = ref / np.linalg.norm(ref)
            cos = float(mine @ ref)
            assert cos > 0.9999, (n, cos)
    finally:
        e.shutdown()


def test_roberta_reranker_scores_match_hf(tmp_path_factory):
    cfg = transformers.XLMRobertaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=80, type_vocab_size=1,
        pad_token_id=1, num_labels=1, torch_dtype="float32",
    )
    torch.manual_seed(0)
    hf = transformers.XLMRobertaForSequenceClassification(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("xlmr_cls")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=1024, attention_backend="xla",
        random_seed=0, is_embedding=True,
    )
    try:
        rng = np.random.default_rng(2)
        for n in (5, 13):
            ids = rng.integers(3, VOCAB, size=n).tolist()
            out = e.encode(input_ids=ids)
            mine = np.asarray(out["embedding"], dtype=np.float32)
            with torch.no_grad():
                ref = hf(
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(1, n, dtype=torch.long),
                ).logits[0].numpy()
            np.testing.assert_allclose(mine, ref, rtol=2e-4, atol=2e-5)
    finally:
        e.shutdown()
