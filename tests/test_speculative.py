"""Speculative decoding: draft+verify rounds must produce EXACTLY the
target model's greedy output (lossless property of greedy spec decoding),
with acceptance statistics tracked (reference `test_eagle_infer.py`
pattern)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def mk_llama(d, layers, seed):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=layers, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(seed)
    m = transformers.LlamaForCausalLM(cfg)
    m.save_pretrained(d, safe_serialization=True)
    return m


@pytest.fixture(scope="module")
def spec_setup(tmp_path_factory):
    dt = tmp_path_factory.mktemp("target")
    dd = tmp_path_factory.mktemp("draft")
    target = mk_llama(dt, layers=2, seed=0)
    mk_llama(dd, layers=1, seed=0)  # same init seed -> decent agreement
    e = Engine(
        model_path=str(dt), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=8192, attention_backend="xla",
        random_seed=0,
        speculative_algorithm="STANDALONE",
        speculative_draft_model_path=str(dd),
        speculative_num_steps=3,
    )
    yield e, target
    e.shutdown()


def test_spec_matches_target_greedy(spec_setup):
    engine, target = spec_setup
    rng = np.random.default_rng(0)
    for n in (5, 17, 30):
        prompt = rng.integers(3, VOCAB, size=n).tolist()
        out = engine.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True},
        )
        with torch.no_grad():
            ref = target.generate(
                torch.tensor([prompt]), max_new_tokens=12, do_sample=False
            )[0][n:].tolist()
        assert out["output_ids"] == ref, f"spec output diverged for len {n}"


def test_spec_batch(spec_setup):
    engine, target = spec_setup
    rng = np.random.default_rng(1)
    prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (6, 11, 23, 9)]
    outs = engine.generate(
        input_ids=prompts,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True},
    )
    for p, o in zip(prompts, outs):
        with torch.no_grad():
            ref = target.generate(
                torch.tensor([p]), max_new_tokens=8, do_sample=False
            )[0][len(p):].tolist()
        assert o["output_ids"] == ref


def test_spec_falls_back_for_sampling(spec_setup):
    engine, _ = spec_setup
    out = engine.generate(
        input_ids=[5, 6, 7],
        sampling_params={"max_new_tokens": 8, "temperature": 1.0, "ignore_eos": True},
    )
    assert len(out["output_ids"]) == 8
