"""Sharded model-state save/load (reference ShardedStateLoader,
`model_loader/loader.py:589` + `model_runner.py:1760` save_remote_model):
dump the prepared (quantized+fused) param tree per host, cold-start from
the dump without HF parsing, identical greedy output."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128
SP = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
PROMPT = list(np.random.default_rng(3).integers(3, VOCAB, size=9))

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(cfg)
    d = tmp_path_factory.mktemp("tiny_shard_model")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def _engine(path, **kw):
    return Engine(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, **kw,
    )


def test_save_load_roundtrip(tiny_model_dir, tmp_path):
    e = _engine(tiny_model_dir)
    try:
        base = e.generate(input_ids=[PROMPT], sampling_params=SP)[0][
            "output_ids"
        ]
        ok, msg = e.save_sharded_state(str(tmp_path / "dump"))
        assert ok, msg
    finally:
        e.shutdown()

    e2 = _engine(str(tmp_path / "dump"), load_format="sharded_state")
    try:
        got = e2.generate(input_ids=[PROMPT], sampling_params=SP)[0][
            "output_ids"
        ]
    finally:
        e2.shutdown()
    assert got == base

    # load_format auto detects the dump too
    e3 = _engine(str(tmp_path / "dump"))
    try:
        got3 = e3.generate(input_ids=[PROMPT], sampling_params=SP)[0][
            "output_ids"
        ]
    finally:
        e3.shutdown()
    assert got3 == base


def test_save_load_quantized(tiny_model_dir, tmp_path):
    """The dump captures QUANTIZED + FUSED leaves (dataclass pytree) and
    restores them without re-quantizing."""
    e = _engine(tiny_model_dir, quantization="int8")
    try:
        base = e.generate(input_ids=[PROMPT], sampling_params=SP)[0][
            "output_ids"
        ]
        ok, msg = e.save_sharded_state(str(tmp_path / "qdump"))
        assert ok, msg
    finally:
        e.shutdown()
    e2 = _engine(
        str(tmp_path / "qdump"), load_format="sharded_state",
        quantization="int8",
    )
    try:
        got = e2.generate(input_ids=[PROMPT], sampling_params=SP)[0][
            "output_ids"
        ]
    finally:
        e2.shutdown()
    assert got == base
