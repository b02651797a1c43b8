"""Tensor-parallel correctness on the virtual 8-device CPU mesh: TP runs
must produce exactly the single-chip greedy outputs (reference multi-GPU
suites, SURVEY.md §4 'distributed tests without a cluster')."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(cfg)
    d = tmp_path_factory.mktemp("tp_model")
    m.save_pretrained(d, safe_serialization=True)
    return str(d), m


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_matches_hf(model_dir, tp):
    if jax.device_count() < tp:
        pytest.skip("not enough devices")
    path, hf = model_dir
    e = Engine(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0, tp_size=tp,
    )
    try:
        rng = np.random.default_rng(0)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (5, 18, 33)]
        outs = e.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 6, "temperature": 0.0},
        )
        for p, o in zip(prompts, outs):
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([p]), max_new_tokens=6, do_sample=False
                )[0][len(p):].tolist()
            assert o["output_ids"] == ref, f"tp={tp}: {o['output_ids']} != {ref}"
        # weights actually sharded across devices
        wq = e.model_runner.params["layers"]["wq"]
        assert len(wq.sharding.device_set) == tp
    finally:
        e.shutdown()


@pytest.mark.parametrize("tp", [2])
def test_tp_pallas_kernels_interpret(model_dir, tp, monkeypatch):
    """Pallas kernels under TP via shard_map (interpret mode on the CPU
    mesh): outputs must still match HF greedy exactly."""
    if jax.device_count() < tp:
        pytest.skip("not enough devices")
    monkeypatch.setenv("SGLANG_TPU_PALLAS_INTERPRET", "1")
    path, hf = model_dir
    e = Engine(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="pallas",
        random_seed=0, tp_size=tp,
    )
    try:
        rng = np.random.default_rng(2)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (7, 21)]
        outs = e.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 5, "temperature": 0.0},
        )
        for p, o in zip(prompts, outs):
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([p]), max_new_tokens=5, do_sample=False
                )[0][len(p):].tolist()
            assert o["output_ids"] == ref
    finally:
        e.shutdown()
