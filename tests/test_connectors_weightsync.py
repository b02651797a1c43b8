"""Connectors (file/redis/s3), remote model pulls, tensor weight sync,
bench_one_batch.

Reference behaviors: `srt/connector/` (BaseConnector, redis, s3),
`update_weights_from_tensor` RPC, `bench_one_batch.py`.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.connector import (
    FileConnector,
    create_connector,
    is_remote_url,
    pull_model,
)
from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def _save_tiny(tmp_path, seed=0):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(seed)
    hf = transformers.LlamaForCausalLM(cfg)
    hf.eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    return hf


def test_file_connector_roundtrip(tmp_path):
    url = f"file://{tmp_path}/store"
    c = create_connector(url)
    assert isinstance(c, FileConnector)
    c.set("a/b.bin", b"hello")
    c.set("c.txt", b"world")
    assert c.get("a/b.bin") == b"hello"
    assert c.list() == ["a/b.bin", "c.txt"]
    assert c.list("a/") == ["a/b.bin"]
    assert is_remote_url(url) and not is_remote_url("/local/path")


def test_pull_model_and_engine_load(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    hf = _save_tiny(src)
    url = f"file://{src}"
    cache = str(tmp_path / "cache")
    local = pull_model(url, cache)
    assert os.path.exists(os.path.join(local, "config.json"))
    # cached second pull returns the same path without re-copying
    assert pull_model(url, cache) == local

    e = Engine(
        model_path=local, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=1024, attention_backend="xla",
        random_seed=0,
    )
    try:
        prompt = [5, 9, 11, 7]
        out = e.generate(
            input_ids=[prompt],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=4, do_sample=False
            )[0][len(prompt):].tolist()
        assert out[0]["output_ids"] == ref
    finally:
        e.shutdown()


def test_update_weights_from_tensor(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    _save_tiny(d, seed=0)
    # a second model provides the replacement weights
    cfg2_dir = tmp_path / "m2"
    cfg2_dir.mkdir()
    hf2 = _save_tiny(cfg2_dir, seed=1)

    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=1024, attention_backend="xla",
        random_seed=0,
    )
    try:
        prompt = [5, 9, 11, 7]
        sp = {"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True}
        before = e.generate(input_ids=[prompt], sampling_params=sp)

        named = [
            (name, t.detach().numpy())
            for name, t in hf2.state_dict().items()
        ]
        ok, msg = e.update_weights_from_tensor(named)
        assert ok, msg
        e.flush_cache()
        after = e.generate(input_ids=[prompt], sampling_params=sp)
        with torch.no_grad():
            ref2 = hf2.generate(
                torch.tensor([prompt]), max_new_tokens=5, do_sample=False
            )[0][len(prompt):].tolist()
        assert after[0]["output_ids"] == ref2
        assert after[0]["output_ids"] != before[0]["output_ids"]
    finally:
        e.shutdown()


def test_bench_one_batch_runs(tmp_path, capsys):
    d = tmp_path / "m"
    d.mkdir()
    _save_tiny(d)
    from sglang_npu_tpu.bench_one_batch import main

    main([
        "--model-path", str(d), "--dtype", "float32",
        "--batch-size", "2", "--input-len", "8", "--output-len", "4",
        "--page-size", "4", "--attention-backend", "xla",
    ])
    lines = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("{")
    ]
    assert lines
    res = json.loads(lines[0])
    assert res["decode_tok_s"] and res["prefill_latency_s"] > 0


def test_mmlu_harness_and_engine_score(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    _save_tiny(d)
    rows = [
        {"question": f"What is {i}+{i}?",
         "choices": [str(2 * i), str(2 * i + 1), "zero", "many"],
         "answer": 0}
        for i in range(8)
    ]
    data = str(tmp_path / "mmlu.jsonl")
    with open(data, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    e = Engine(
        model_path=str(d), dtype="float32", tokenizer_mode="byte",
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    try:
        from sglang_npu_tpu.eval.mmlu import run_eval

        res = run_eval(e, data, num_questions=4, num_shots=2)
        assert res["num_questions"] == 4
        assert 0.0 <= res["accuracy"] <= 1.0
        scores = e.score("choose:", [" A", " B", " C"])
        assert len(scores) == 3
    finally:
        e.shutdown()


def test_update_weights_from_distributed(tmp_path):
    """RL trainer push over the ZMQ group (reference
    `update_weights_from_distributed`, `model_runner.py:831-914`): the
    engine joins the publisher's group, pulls named tensors, and greedy
    output flips to the new weights."""
    d = tmp_path / "wsync_model"
    d.mkdir()
    hf_a = _save_tiny(d, seed=0)
    hf_b = _save_tiny_state_only(seed=1)

    from sglang_npu_tpu.weight_sync import WeightPublisher

    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    pub = WeightPublisher()
    try:
        prompt = list(np.random.default_rng(0).integers(3, VOCAB, size=8))
        sp = {"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True}

        def ref(m):
            with torch.no_grad():
                return m.generate(
                    torch.tensor([prompt]), max_new_tokens=5, do_sample=False
                )[0][len(prompt):].tolist()

        assert e.generate(input_ids=prompt, sampling_params=sp)[
            "output_ids"
        ] == ref(hf_a.eval())

        ok, msg = e.init_weights_update_group(pub.address)
        assert ok, msg

        named = [
            (k, v.numpy()) for k, v in hf_b.state_dict().items()
        ]
        pub.send_named(named)
        ok, msg = e.update_weights_from_distributed([n for n, _ in named])
        assert ok, msg

        assert e.generate(input_ids=prompt, sampling_params=sp)[
            "output_ids"
        ] == ref(hf_b.eval())

        # unknown group is a clean error
        ok, _ = e.update_weights_from_distributed(["x"], group_name="nope")
        assert not ok
    finally:
        pub.close()
        e.shutdown()


def _save_tiny_state_only(seed):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(cfg)
