"""Chunk/decode alternation (MIXED-mode equivalent of reference
`ForwardMode.MIXED`, `forward_batch_info.py:68`): while a long prompt
prefills in chunks, running decodes must advance BETWEEN chunks instead of
stalling for the whole prompt — and outputs stay exactly equal to the
non-alternating scheduler."""

import threading
import time

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=2048, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(cfg)
    d = tmp_path_factory.mktemp("mixed_model")
    m.save_pretrained(d, safe_serialization=True)
    return str(d)


def _mk(path, mixed: bool) -> Engine:
    return Engine(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=16384, attention_backend="xla",
        random_seed=0, chunked_prefill_size=128, max_prefill_tokens=128,
        disable_mixed_chunk=not mixed, decode_steps=4,
    )


def _run_concurrent(engine, long_prompt, short_prompt):
    """Start a decode stream, then inject a multi-chunk prompt; capture the
    stream's inter-chunk arrival gaps (iteration counts stand in for time
    on CPU)."""
    rng = np.random.default_rng(0)
    stream_tokens = []
    stream_done = threading.Event()

    def streamer():
        for chunk in engine.generate(
            input_ids=short_prompt,
            sampling_params={
                "max_new_tokens": 48, "temperature": 0.0, "ignore_eos": True
            },
            stream=True,
        ):
            stream_tokens.append((time.monotonic(), len(chunk["output_ids"])))
        stream_done.set()

    t = threading.Thread(target=streamer)
    t.start()
    time.sleep(0.3)  # let the stream enter steady decode
    long_out = engine.generate(
        input_ids=long_prompt,
        sampling_params={
            "max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True
        },
    )
    stream_done.wait(timeout=120)
    t.join(timeout=10)
    return stream_tokens, long_out


def test_decode_advances_between_chunks(model_dir):
    rng = np.random.default_rng(1)
    long_prompt = rng.integers(3, VOCAB, size=1280).tolist()  # 10 chunks
    short_prompt = rng.integers(3, VOCAB, size=6).tolist()

    e = _mk(model_dir, mixed=True)
    try:
        stream, long_out = _run_concurrent(e, long_prompt, short_prompt)
        assert len(long_out["output_ids"]) == 4
        # the stream must have produced tokens WHILE the 10-chunk prefill
        # was in flight: forward counter interleaving is visible as decode
        # emissions between the long request's submission and completion
        st = e.get_internal_state()
        assert st["forward_ct"] > 10
    finally:
        e.shutdown()

    # outputs identical with alternation off
    e2 = _mk(model_dir, mixed=False)
    try:
        stream2, long_out2 = _run_concurrent(e2, long_prompt, short_prompt)
        assert long_out2["output_ids"] == long_out["output_ids"]
    finally:
        e2.shutdown()


def test_alternation_interleaves_forward_modes(model_dir):
    """White-box: wrap the runner to record the dispatch sequence; with
    alternation on, decode windows appear between the long prompt's
    chunks."""
    rng = np.random.default_rng(2)
    long_prompt = rng.integers(3, VOCAB, size=640).tolist()  # 5 chunks

    e = _mk(model_dir, mixed=True)
    try:
        seq = []
        sched = e.scheduler
        orig_dispatch = sched.runner.decode_dispatch
        orig_fas = sched.runner.forward_and_sample

        def rec_dispatch(mwb, **kw):
            seq.append("D")
            return orig_dispatch(mwb, **kw)

        def rec_fas(mwb):
            seq.append("P" if mwb.extend_seq_lens is not None else "D")
            return orig_fas(mwb)

        sched.runner.decode_dispatch = rec_dispatch
        sched.runner.forward_and_sample = rec_fas

        done = threading.Event()
        out_short = {}

        def streamer():
            out_short["o"] = e.generate(
                input_ids=[3, 5, 7, 9],
                sampling_params={
                    "max_new_tokens": 64, "temperature": 0.0,
                    "ignore_eos": True,
                },
            )
            done.set()

        t = threading.Thread(target=streamer)
        t.start()
        time.sleep(0.3)
        e.generate(
            input_ids=long_prompt,
            sampling_params={
                "max_new_tokens": 2, "temperature": 0.0, "ignore_eos": True
            },
        )
        done.wait(timeout=120)
        t.join(timeout=10)
        s = "".join(seq)
        # at least one decode window between two prefill chunks
        assert "PDP" in s, s
    finally:
        e.shutdown()
