"""Session continuation tests (reference `session_controller.py`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def test_session_continuation(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(cfg)
    d = tmp_path_factory.mktemp("sess_model")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=8192, attention_backend="xla",
        random_seed=0,
    )
    try:
        sid = e.open_session()
        sp = {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}
        turn1 = [5, 6, 7, 8]
        out1 = e.generate(input_ids=turn1, sampling_params=sp,
                          session_params={"id": sid})
        # second turn sends only the delta; server prepends history
        turn2 = [9, 10]
        out2 = e.generate(input_ids=turn2, sampling_params=sp,
                          session_params={"id": sid})
        # equivalent stateless request:
        full = turn1 + out1["output_ids"] + turn2
        ref = e.generate(input_ids=full, sampling_params=sp)
        assert out2["output_ids"] == ref["output_ids"]
        # prompt_tokens reflects the full (history + delta) context
        assert out2["meta_info"]["prompt_tokens"] == len(full)
        # session prefix should mostly hit the radix cache
        assert out2["meta_info"]["cached_tokens"] >= len(turn1)
        e.close_session(sid)
        # closed session: delta used as-is
        out3 = e.generate(input_ids=turn2, sampling_params=sp,
                          session_params={"id": sid})
        assert out3["meta_info"]["prompt_tokens"] == len(turn2)
    finally:
        e.shutdown()
