"""Sliding-window hybrid KV pool (ops/hybrid_kv.py + SWARadixCache).

Covers the reference SWA stack's behaviors (`memory_pool.py:420` SWAKVPool,
`swa_radix_cache.py`) under the TPU ring design:
  * HF greedy parity with decode far past the window (ring wraparound)
  * window-pool memory stays bounded by #requests, not context length
  * multi-turn continuation reuses the cached prefix via window snapshots
  * chunked prefill through the ring
  * window-pool pressure evicts snapshots (tombstone analogue), not crashes
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def make_model(tmp_path_factory, layers=4, window=8):
    cfg = transformers.Gemma2Config(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=layers,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        sliding_window=window,
        query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        torch_dtype="float32",
        eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.Gemma2ForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("gemma2swa")
    hf.save_pretrained(d, safe_serialization=True)
    return hf, str(d)


@pytest.fixture(scope="module")
def swa_setup(tmp_path_factory):
    hf, d = make_model(tmp_path_factory)
    e = Engine(
        model_path=d, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    yield hf, e
    e.shutdown()


def hf_greedy(hf, prompt, n):
    with torch.no_grad():
        return hf.generate(
            torch.tensor([prompt]), max_new_tokens=n, do_sample=False
        )[0][len(prompt):].tolist()


def test_hybrid_pool_active(swa_setup):
    _, e = swa_setup
    runner = e.scheduler.runner
    from sglang_npu_tpu.ops.hybrid_kv import HybridKVPool

    assert isinstance(runner.kv_pool, HybridKVPool)
    assert runner.swa_ring_pages == 8 // 4 + 1
    # two of four layers are windowed
    assert runner.kv_pool.swa.shape[0] == 2
    assert runner.kv_pool.full.shape[0] == 2


def test_decode_past_window_parity(swa_setup):
    """Decode 40 tokens with window 8: the ring wraps many times."""
    hf, e = swa_setup
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, VOCAB, size=5).tolist()
    out = e.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 40, "temperature": 0.0,
                         "ignore_eos": True},
    )
    assert out["output_ids"] == hf_greedy(hf, prompt, 40)


def test_long_prompt_chunked_ring(swa_setup):
    """Prompt longer than the window; extends write through the ring."""
    hf, e = swa_setup
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, VOCAB, size=120).tolist()
    out = e.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                         "ignore_eos": True},
    )
    assert out["output_ids"] == hf_greedy(hf, prompt, 8)


def test_snapshot_prefix_reuse(swa_setup):
    """Multi-turn continuation: run prompt A, then A + its own output +
    more tokens.  The second call must (a) hit the snapshot path and (b)
    still match HF exactly."""
    hf, e = swa_setup
    e.flush_cache()
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, VOCAB, size=24).tolist()
    sp = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}
    out1 = e.generate(input_ids=prompt, sampling_params=sp)
    follow = prompt + out1["output_ids"] + rng.integers(3, VOCAB, size=5).tolist()
    out2 = e.generate(input_ids=follow, sampling_params=sp)
    assert out2["output_ids"] == hf_greedy(hf, follow, 12)
    # the second request must have reused a cached prefix
    state = e.get_internal_state()
    assert state["cache_hit_rate"] > 0, state


def test_swa_memory_bounded(swa_setup):
    """After long generations the window pool's busy pages stay <= rings
    needed, regardless of sequence length."""
    _, e = swa_setup
    e.flush_cache()
    rng = np.random.default_rng(4)
    sp = {"max_new_tokens": 60, "temperature": 0.0, "ignore_eos": True}
    e.generate(input_ids=rng.integers(3, VOCAB, size=30).tolist(),
               sampling_params=sp)
    sched = e.scheduler
    nw = sched.swa.ring_pages
    used = sched.swa.allocator.num_pages - 1 - sched.swa.allocator.available_pages()
    # one finished request -> at most one ring retained (as a snapshot)
    assert used <= nw, (used, nw)
    # full pool retains the whole sequence (90 tokens / 4 per page)
    full_used = sched.allocator.num_pages - 1 - sched.allocator.available_pages()
    assert full_used >= 90 // 4


def test_fork_recomputes(swa_setup):
    """A shorter fork of a cached sequence cannot use the window snapshot
    (it ends mid-sequence) — must still produce exact HF output."""
    hf, e = swa_setup
    e.flush_cache()
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, VOCAB, size=40).tolist()
    sp = {"max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True}
    e.generate(input_ids=prompt, sampling_params=sp)
    fork = prompt[:20] + rng.integers(3, VOCAB, size=6).tolist()
    out = e.generate(input_ids=fork, sampling_params=sp)
    assert out["output_ids"] == hf_greedy(hf, fork, 10)


def test_many_requests_swa_pressure(swa_setup):
    """More distinct finished sequences than the window pool can snapshot:
    old snapshots must be evicted, later requests still correct."""
    hf, e = swa_setup
    e.flush_cache()
    rng = np.random.default_rng(6)
    sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
    prompts = [rng.integers(3, VOCAB, size=16).tolist() for _ in range(8)]
    outs = e.generate(input_ids=prompts, sampling_params=sp)
    for p, o in zip(prompts, outs):
        assert o["output_ids"] == hf_greedy(hf, p, 6)
