"""Tensor dump/compare debugging (reference `debug_utils/dumper.py` +
`dump_comparator.py`) and by-stage profiler traces (reference
`--profile-by-stage`, `scheduler_profiler_mixin.py`)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("dump_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    return str(d)


def _run(model_dir, dump_dir, prompts, flip=False):
    e = Engine(
        model_path=model_dir, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, debug_tensor_dump_output_folder=dump_dir,
    )
    try:
        e.generate(
            input_ids=[list(p) for p in prompts],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
    finally:
        e.shutdown()


def test_dump_and_compare_roundtrip(model_dir, tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import dump_compare

    rng = np.random.default_rng(0)
    prompts = [rng.integers(3, VOCAB, size=k) for k in (6, 11)]
    da, db = str(tmp_path / "run_a"), str(tmp_path / "run_b")
    _run(model_dir, da, prompts)
    _run(model_dir, db, prompts)

    files = sorted(os.listdir(da))
    assert any("extend" in f for f in files)
    assert any("decode" in f for f in files)
    ext = np.load(os.path.join(da, next(f for f in files if "extend" in f)))
    # per-layer residual hiddens [L, B, E, D] for the 2-layer model
    assert ext["hidden"].shape[0] == 2
    assert "logits" in ext.files and "tokens" in ext.files

    # identical runs -> identical dumps
    assert dump_compare.compare(da, db, atol=0.0) == 0

    # a perturbed tensor is caught with its location
    bad = dict(np.load(os.path.join(db, files[0])))
    bad["hidden"] = bad["hidden"].copy()
    bad["hidden"][1] += 1e-3
    np.savez(os.path.join(db, files[0]), **bad)
    assert dump_compare.compare(da, db, atol=0.0) == 1


def test_by_stage_profile_traces(model_dir, tmp_path):
    e = Engine(
        model_path=model_dir, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        out = str(tmp_path / "traces")
        e.scheduler.start_stage_profile(out, 1)
        rng = np.random.default_rng(1)
        e.generate(
            input_ids=[rng.integers(3, VOCAB, size=8).tolist()
                       for _ in range(2)],
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert e.scheduler.profile_stage_state is None  # completed
        for stage in ("prefill", "decode"):
            d = os.path.join(out, stage)
            assert os.path.isdir(d), f"missing {stage} trace dir"
            found = []
            for root, _dirs, fs in os.walk(d):
                found += [f for f in fs if f.endswith((".pb", ".xplane.pb",
                                                       ".trace.json.gz"))]
            assert found, f"no trace files under {d}"
    finally:
        e.shutdown()
