"""Regression tests for the round-2 correctness fixes:

  * chunked-prefill input logprobs accumulate per chunk (no livelock when
    the logprob region exceeds chunked_prefill_size)
  * min_new_tokens masks EOS/stop-token logits on device
  * lpm policy + --disable-radix-cache falls back cleanly (requests still
    forward their prompts)
  * abort_all emits finish records for waiting requests
  * ebnf/structural_tag are rejected loudly, not silently ignored
  * a failing scheduler step aborts only the current batch, not the cache
"""

import threading
import time

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.layers import sampler as sampler_ops
from sglang_npu_tpu.model_executor.forward_batch_info import SamplingDevice

VOCAB = 128


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
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
    d = tmp_path_factory.mktemp("r2_model")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


@pytest.fixture(scope="module")
def engine(model_dir):
    path, _ = model_dir
    e = Engine(
        model_path=path,
        dtype="float32",
        skip_tokenizer_init=True,
        page_size=4,
        max_total_tokens=8192,
        attention_backend="xla",
        random_seed=0,
        chunked_prefill_size=16,  # small: long logprob regions must chunk
        stream_interval=1,
    )
    yield e
    e.shutdown()


def test_chunked_input_logprobs_match_hf(engine, model_dir):
    """A logprob region longer than chunked_prefill_size must terminate and
    produce the same teacher-forced logprobs as HF (advisor high #2)."""
    _, hf = model_dir
    rng = np.random.default_rng(7)
    prompt = list(rng.integers(3, VOCAB, size=50))  # > 2 chunks of 16
    out = engine.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 1, "temperature": 0.0,
                         "ignore_eos": True},
        return_logprob=True,
        logprob_start_len=0,
    )
    got = out["meta_info"]["input_token_logprobs"]
    # positions 1..49 (position 0 has no conditional logprob)
    assert len(got) == len(prompt) - 1
    with torch.no_grad():
        logits = hf(torch.tensor([prompt])).logits[0]
    ref_lp = torch.log_softmax(logits.float(), dim=-1)
    for j, (lp, tok, _s) in enumerate(got):
        abs_idx = j + 1
        assert tok == prompt[abs_idx]
        ref = float(ref_lp[abs_idx - 1, tok])
        assert abs(lp - ref) < 2e-2, (abs_idx, lp, ref)


def test_min_new_tokens_masks_stop_tokens_unit():
    logits = jnp.zeros((2, 16), jnp.float32)
    sampling = SamplingDevice(
        temperatures=jnp.ones((2,)),
        top_ks=jnp.full((2,), 16, jnp.int32),
        top_ps=jnp.ones((2,)),
        min_ps=jnp.zeros((2,)),
        min_new_remaining=jnp.array([3, 0], jnp.int32),
        stop_mask_tokens=jnp.array([[2, 5, -1], [2, -1, -1]], jnp.int32),
    )
    out0 = sampler_ops.apply_min_new_tokens(logits, sampling, 0)
    # row 0 still needs 3 tokens: 2 and 5 masked; row 1 done: untouched
    assert float(out0[0, 2]) < -1e9 and float(out0[0, 5]) < -1e9
    assert float(out0[0, 3]) == 0.0
    assert float(out0[1, 2]) == 0.0
    out3 = sampler_ops.apply_min_new_tokens(logits, sampling, 3)
    assert float(out3[0, 2]) == 0.0  # mask lifts within the fused window


def test_min_new_tokens_engine(engine):
    prompt = [5, 9, 11, 33, 7]
    base = engine.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                         "ignore_eos": True},
    )["output_ids"]
    blocked = base[0]
    out = engine.generate(
        input_ids=prompt,
        sampling_params={
            "max_new_tokens": 8,
            "temperature": 0.0,
            "ignore_eos": True,
            "min_new_tokens": 4,
            "stop_token_ids": [blocked],
        },
    )["output_ids"]
    assert len(out) >= 4
    assert blocked not in out[:4]


def test_lpm_with_chunk_cache(model_dir):
    """--schedule-policy lpm + --disable-radix-cache must still forward the
    prompt (advisor medium #3: the silent fcfs fallback skipped
    init_next_round_input and prefilled zero tokens)."""
    path, hf = model_dir
    e = Engine(
        model_path=path,
        dtype="float32",
        skip_tokenizer_init=True,
        page_size=4,
        max_total_tokens=4096,
        attention_backend="xla",
        random_seed=0,
        schedule_policy="lpm",
        disable_radix_cache=True,
    )
    try:
        prompt = list(np.random.default_rng(3).integers(3, VOCAB, size=12))
        out = e.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=6, do_sample=False
            )[0][12:].tolist()
        assert out["output_ids"] == ref
    finally:
        e.shutdown()


def test_abort_all_releases_waiting(engine):
    """abort_all must emit finish records for queued requests so clients
    unblock (advisor medium #4)."""
    # Stall the scheduler with a long request, queue more, then abort all.
    results = {}

    def run(tag, n_new):
        out = engine.generate(
            input_ids=[5, 9, 11],
            sampling_params={"max_new_tokens": n_new, "temperature": 0.0,
                             "ignore_eos": True},
        )
        results[tag] = out

    threads = [
        threading.Thread(target=run, args=(i, 512)) for i in range(4)
    ]
    for t in threads:
        t.start()
    time.sleep(0.3)
    engine.abort_request(abort_all=True)
    for t in threads:
        t.join(timeout=30)
    assert all(not t.is_alive() for t in threads), "client hung after abort_all"
    assert len(results) == 4


def test_ebnf_rejected_loudly(engine):
    out = engine.generate(
        input_ids=[5, 9, 11],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                         "ebnf": 'root ::= "yes" | "no"'},
    )
    fr = out["meta_info"]["finish_reason"]
    assert fr["type"] == "abort"  # loud failure, not silent free text


def test_step_failure_isolates_batch(model_dir):
    path, hf = model_dir
    e = Engine(
        model_path=path,
        dtype="float32",
        skip_tokenizer_init=True,
        page_size=4,
        max_total_tokens=4096,
        attention_backend="xla",
        random_seed=0,
    )
    try:
        # Seed the radix cache with a finished request.
        warm = list(np.random.default_rng(5).integers(3, VOCAB, size=16))
        e.generate(
            input_ids=warm,
            sampling_params={"max_new_tokens": 2, "temperature": 0.0,
                             "ignore_eos": True},
        )
        state0 = e.get_internal_state()
        assert state0["evictable_tokens"] > 0

        runner = e.scheduler.runner
        orig = runner.forward_and_sample
        fail_once = {"armed": True}

        def flaky(mwb):
            if fail_once["armed"]:
                fail_once["armed"] = False
                raise RuntimeError("injected fault")
            return orig(mwb)

        runner.forward_and_sample = flaky
        out = e.generate(
            input_ids=[5, 9, 11],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        runner.forward_and_sample = orig
        # the poisoned step aborted that request...
        assert out["meta_info"]["finish_reason"]["type"] == "abort"
        # ...but did NOT flush the radix cache (previously a global nuke)
        state1 = e.get_internal_state()
        assert state1["evictable_tokens"] == state0["evictable_tokens"]
        # and the engine still serves correctly afterwards
        out2 = e.generate(
            input_ids=warm,
            sampling_params={"max_new_tokens": 2, "temperature": 0.0,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([warm]), max_new_tokens=2, do_sample=False
            )[0][16:].tolist()
        assert out2["output_ids"] == ref
    finally:
        e.shutdown()
