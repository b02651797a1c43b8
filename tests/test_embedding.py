"""Embedding-mode engine + weight-update RPC tests."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def make_model(tmp, seed=0):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(seed)
    m = transformers.LlamaForCausalLM(cfg)
    m.save_pretrained(tmp, safe_serialization=True)
    return m


def test_embedding_mode(tmp_path_factory):
    d = tmp_path_factory.mktemp("emb_model")
    hf = make_model(d)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0, is_embedding=True,
    )
    try:
        out = e.encode(input_ids=[3, 5, 7, 9])
        emb = np.asarray(out["embedding"])
        assert emb.shape == (64,)
        np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-4)
        assert out["meta_info"]["prompt_tokens"] == 4

        # HF reference: normalized last hidden state
        with torch.no_grad():
            hs = hf.model(torch.tensor([[3, 5, 7, 9]])).last_hidden_state[0, -1]
        ref = (hs / hs.norm()).numpy()
        np.testing.assert_allclose(emb, ref, rtol=2e-3, atol=2e-3)

        # batch
        outs = e.encode(input_ids=[[3, 5], [7, 9, 11]])
        assert len(outs) == 2
    finally:
        e.shutdown()


def test_update_weights_from_disk(tmp_path_factory):
    d1 = tmp_path_factory.mktemp("w1")
    d2 = tmp_path_factory.mktemp("w2")
    make_model(d1, seed=0)
    make_model(d2, seed=1)
    e = Engine(
        model_path=str(d1), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        sp = {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}
        out1 = e.generate(input_ids=[5, 6, 7], sampling_params=sp)["output_ids"]
        ok, msg = e.update_weights_from_disk(str(d2))
        assert ok, msg
        e.flush_cache()
        out2 = e.generate(input_ids=[5, 6, 7], sampling_params=sp)["output_ids"]
        assert out1 != out2  # different weights -> different greedy tokens
        # and switching back restores behavior
        ok, _ = e.update_weights_from_disk(str(d1))
        assert ok
        e.flush_cache()
        out3 = e.generate(input_ids=[5, 6, 7], sampling_params=sp)["output_ids"]
        assert out3 == out1
    finally:
        e.shutdown()
