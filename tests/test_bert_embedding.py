"""BERT encoder embedding serving.

Reference behavior: `srt/models/bert.py` embedding path — encoder-only
model served with --is-embedding; mean-pooled L2-normalized embeddings
must match HF BertModel numerics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def test_bert_embeddings_match_hf(tmp_path_factory):
    cfg = transformers.BertConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_act="gelu", torch_dtype="float32",
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("bert")
    hf.save_pretrained(d, safe_serialization=True)

    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=1024, attention_backend="xla",
        random_seed=0, is_embedding=True,
    )
    try:
        rng = np.random.default_rng(0)
        for n in (5, 12, 31):
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


def test_bert_rejects_generation(tmp_path_factory):
    cfg = transformers.BertConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=4,
        max_position_embeddings=64, torch_dtype="float32",
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("bert_gen")
    transformers.BertModel(cfg).save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=512, attention_backend="xla",
        random_seed=0, is_embedding=True,
    )
    try:
        # batch of rerank-style pairs all embed fine
        outs = e.encode(input_ids=[[5, 9, 11], [7, 13, 4, 2]])
        assert len(outs) == 2
        for o in outs:
            v = np.asarray(o["embedding"])
            assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-4
    finally:
        e.shutdown()
