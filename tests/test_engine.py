"""End-to-end Engine tests on the CPU backend with a tiny real model —
the reference's engine-level test layer (`test/srt/test_srt_engine.py`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.server_args import ServerArgs

VOCAB = 128


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        tie_word_embeddings=False,
        torch_dtype="float32",
        eos_token_id=2,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    d = tmp_path_factory.mktemp("tiny_engine_model")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


@pytest.fixture(scope="module")
def engine(tiny_model_dir):
    path, _ = tiny_model_dir
    e = Engine(
        model_path=path,
        dtype="float32",
        skip_tokenizer_init=True,
        page_size=4,
        max_total_tokens=8192,
        attention_backend="xla",
        random_seed=0,
        chunked_prefill_size=32,
        stream_interval=1,
    )
    yield e
    e.shutdown()


def test_single_generate(engine, tiny_model_dir):
    _, hf = tiny_model_dir
    prompt = list(np.random.default_rng(0).integers(3, VOCAB, size=9))
    out = engine.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True},
    )
    assert len(out["output_ids"]) == 8
    assert out["meta_info"]["finish_reason"]["type"] == "length"
    assert out["meta_info"]["prompt_tokens"] == 9

    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False
        )[0][9:].tolist()
    assert out["output_ids"] == ref


def test_batch_generate_matches_hf(engine, tiny_model_dir):
    _, hf = tiny_model_dir
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(3, VOCAB, size=n)) for n in (5, 17, 40, 23)]
    outs = engine.generate(
        input_ids=prompts,
        sampling_params={"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True},
    )
    assert len(outs) == 4
    for p, o in zip(prompts, outs):
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([p]), max_new_tokens=6, do_sample=False
            )[0][len(p):].tolist()
        assert o["output_ids"] == ref


def test_chunked_prefill_long_prompt(engine, tiny_model_dir):
    _, hf = tiny_model_dir
    # 100 tokens > chunked_prefill_size=32 -> 4 chunks
    prompt = list(np.random.default_rng(2).integers(3, VOCAB, size=100))
    out = engine.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True},
    )
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]), max_new_tokens=4, do_sample=False
        )[0][100:].tolist()
    assert out["output_ids"] == ref


def test_eos_stop(engine):
    # temperature sampling will eventually hit eos_token 2 or length
    out = engine.generate(
        input_ids=[5, 6, 7],
        sampling_params={"max_new_tokens": 64, "temperature": 1.5},
    )
    fr = out["meta_info"]["finish_reason"]
    assert fr["type"] in ("stop", "length")
    if fr["type"] == "stop":
        assert out["output_ids"][-1] == 2


def test_stream(engine):
    chunks = list(
        engine.generate(
            input_ids=[9, 10, 11, 12],
            sampling_params={"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True},
            stream=True,
        )
    )
    assert len(chunks) >= 2
    assert chunks[-1]["meta_info"]["finish_reason"] is not None
    lens = [len(c["output_ids"]) for c in chunks]
    assert lens == sorted(lens)
    assert lens[-1] == 5


def test_prefix_cache_hit_reported(engine):
    prompt = list(np.random.default_rng(3).integers(3, VOCAB, size=24))
    engine.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 2, "temperature": 0.0, "ignore_eos": True},
    )
    out2 = engine.generate(
        input_ids=prompt + [4, 5],
        sampling_params={"max_new_tokens": 2, "temperature": 0.0, "ignore_eos": True},
    )
    assert out2["meta_info"]["cached_tokens"] >= 20


def test_internal_state_and_flush(engine):
    st = engine.get_internal_state()
    assert st["num_running_reqs"] == 0
    assert engine.flush_cache() is True


def test_many_concurrent_requests(engine, tiny_model_dir):
    _, hf = tiny_model_dir
    rng = np.random.default_rng(4)
    prompts = [list(rng.integers(3, VOCAB, size=int(n))) for n in rng.integers(4, 60, size=24)]
    outs = engine.generate(
        input_ids=prompts,
        sampling_params={"max_new_tokens": 5, "temperature": 0.0},
    )
    for p, o in zip(prompts, outs):
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([p]), max_new_tokens=5, do_sample=False
            )[0][len(p):].tolist()
        # both stop at eos (token 2) or at length 5
        assert o["output_ids"] == ref


def test_allow_auto_truncate(tmp_path_factory):
    """--allow-auto-truncate (reference flag): over-context prompts are
    clipped instead of aborted."""
    import transformers, torch
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("trunc_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    from sglang_npu_tpu.entrypoints.engine import Engine

    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=1024, attention_backend="xla",
        random_seed=0, allow_auto_truncate=True,
    )
    try:
        import numpy as np

        long_prompt = np.random.default_rng(0).integers(
            3, 128, size=200
        ).tolist()  # > context 64
        out = e.generate(
            input_ids=long_prompt,
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert len(out["output_ids"]) == 4  # served, not aborted
    finally:
        e.shutdown()
