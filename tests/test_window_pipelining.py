"""Decode window pipelining (chained speculative dispatch): greedy outputs
must be IDENTICAL with and without --disable-window-pipelining, including
EOS mid-window (over-generation discard), max_new_tokens limits hit
mid-chain, and new arrivals breaking a chain (reference behavior contract:
the overlap scheduler is invisible to results,
tp_worker_overlap_thread.py:53)."""

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
        max_position_embeddings=512, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(cfg)
    d = tmp_path_factory.mktemp("chain_model")
    m.save_pretrained(d, safe_serialization=True)
    return str(d), m


def _mk(path, pipelining: bool) -> Engine:
    return Engine(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=8192, attention_backend="xla",
        random_seed=0, disable_window_pipelining=not pipelining,
    )


def test_chain_matches_unpipelined_and_hf(model_dir):
    path, hf = model_dir
    rng = np.random.default_rng(7)
    prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (4, 11, 23, 6)]
    sp = {"max_new_tokens": 37, "temperature": 0.0}  # EOS allowed

    e_pipe = _mk(path, True)
    e_ref = _mk(path, False)
    try:
        out_p = e_pipe.generate(input_ids=prompts, sampling_params=sp)
        out_r = e_ref.generate(input_ids=prompts, sampling_params=sp)
        for p, a, b in zip(prompts, out_p, out_r):
            # pipelined and unpipelined engines must agree token-for-token
            # over the full horizon...
            assert a["output_ids"] == b["output_ids"]
            # ...and match HF greedy over a horizon short enough to be free
            # of f32 near-tie argmax noise (long-horizon ties flip between
            # oneDNN and torch matmul rounding; exact HF parity at length
            # is covered by the per-model tests at bf16-safe horizons)
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([p]), max_new_tokens=37, do_sample=False
                )[0][len(p):].tolist()
            assert a["output_ids"][:8] == ref[:8]
        # chains actually engaged
        st = e_pipe.get_internal_state()
        assert st["num_chained_windows"] > 0, st
        st_r = e_ref.get_internal_state()
        assert st_r["num_chained_windows"] == 0

        # mixed lifetimes: different max_new_tokens across the batch hit
        # their limits mid-chain without disturbing surviving rows
        sps = {"max_new_tokens": 9, "temperature": 0.0, "ignore_eos": True}
        spl = {"max_new_tokens": 33, "temperature": 0.0, "ignore_eos": True}
        a_s = e_pipe.generate(input_ids=[prompts[0]], sampling_params=sps)
        a_l = e_pipe.generate(input_ids=[prompts[1]], sampling_params=spl)
        b_s = e_ref.generate(input_ids=[prompts[0]], sampling_params=sps)
        b_l = e_ref.generate(input_ids=[prompts[1]], sampling_params=spl)
        assert a_s[0]["output_ids"] == b_s[0]["output_ids"]
        assert a_l[0]["output_ids"] == b_l[0]["output_ids"]
        assert len(a_s[0]["output_ids"]) == 9
        assert len(a_l[0]["output_ids"]) == 33

        # radix reuse across a chained run stays exact: repeat a prompt
        # and require the identical continuation (prefix pages written by
        # chained windows must be intact)
        again = e_pipe.generate(input_ids=[prompts[2]], sampling_params=sp)
        assert again[0]["output_ids"] == out_p[2]["output_ids"]
    finally:
        e_pipe.shutdown()
        e_ref.shutdown()


def test_chain_with_concurrent_arrivals(model_dir):
    """Streams arriving while chains run: admission breaks the chain, new
    batches re-chain, results stay exact vs the unpipelined engine."""
    import threading
    import time

    path, _ = model_dir
    rng = np.random.default_rng(3)
    prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (8, 17, 5, 29, 12)]
    sp = {"max_new_tokens": 25, "temperature": 0.0, "ignore_eos": True}

    def staggered(engine):
        results = [None] * len(prompts)

        def worker(i):
            time.sleep(0.05 * i)
            results[i] = engine.generate(
                input_ids=[prompts[i]], sampling_params=sp
            )[0]["output_ids"]

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(len(prompts))]
        [t.start() for t in ts]
        [t.join() for t in ts]
        return results

    e_pipe = _mk(path, True)
    e_ref = _mk(path, False)
    try:
        got = staggered(e_pipe)
        ref = staggered(e_ref)
        assert got == ref
    finally:
        e_pipe.shutdown()
        e_ref.shutdown()
