"""Mixed-feature stress: concurrent requests exercising grammar,
logprobs, stop strings, penalties, logit_bias, jump-forward, sessions,
and aborts against one engine — interaction bugs the per-feature suites
miss (reference `test_srt_endpoint` mixed-load pattern)."""

import concurrent.futures
import re as pyre

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 512


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=512, torch_dtype="float32", eos_token_id=257,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("stress_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    e = Engine(
        model_path=str(d), dtype="float32", tokenizer_mode="byte",
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    yield e
    e.shutdown()


def test_mixed_concurrent_load(engine):
    rng = np.random.default_rng(0)

    def plain(i):
        out = engine.generate(
            f"plain {i}: " + "x" * int(rng.integers(1, 40)),
            {"max_new_tokens": int(rng.integers(3, 20)),
             "temperature": 0.7, "ignore_eos": True},
        )
        assert len(out["output_ids"]) >= 1
        return "plain"

    def grammar(i):
        rx = r'\{"id": [0-9]{1,3}\}'
        out = engine.generate(
            f"g{i}: ",
            {"max_new_tokens": 24, "temperature": 0.6, "regex": rx},
        )
        assert pyre.fullmatch(rx, out["text"]), out["text"]
        return "grammar"

    def logprobs(i):
        out = engine.generate(
            f"lp{i}: hello",
            {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True},
            return_logprob=True,
            top_logprobs_num=3,
        )
        lps = out["meta_info"]["output_token_logprobs"]
        assert len(lps) == 6 and all(v[0] <= 0.0 for v in lps)
        return "logprobs"

    def stop_and_penalty(i):
        out = engine.generate(
            f"sp{i}: ",
            {"max_new_tokens": 30, "temperature": 0.9, "stop": ["q", "zz"],
             "frequency_penalty": 0.5, "repetition_penalty": 1.2,
             "ignore_eos": True},
        )
        assert "q" not in out["text"]
        return "stop"

    def biased(i):
        out = engine.generate(
            f"b{i}: ",
            {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True,
             "logit_bias": {"99": 100.0}},
        )
        assert out["output_ids"] == [99] * 4
        return "bias"

    def session(i):
        sid = engine.open_session()
        try:
            engine.generate(
                f"s{i} first",
                {"max_new_tokens": 4, "temperature": 0.0,
                 "ignore_eos": True},
                session_params={"id": sid},
            )
            out2 = engine.generate(
                " more",
                {"max_new_tokens": 4, "temperature": 0.0,
                 "ignore_eos": True},
                session_params={"id": sid},
            )
            assert len(out2["output_ids"]) == 4
        finally:
            engine.close_session(sid)
        return "session"

    kinds = [plain, grammar, logprobs, stop_and_penalty, biased, session]
    jobs = [kinds[i % len(kinds)] for i in range(36)]
    with concurrent.futures.ThreadPoolExecutor(12) as pool:
        done = list(pool.map(lambda t: t[1](t[0]), enumerate(jobs)))
    assert len(done) == 36

    # the engine is still healthy afterwards
    st = engine.get_internal_state()
    assert st["num_running_reqs"] == 0 and st["num_waiting_reqs"] == 0
    out = engine.generate(
        "after storm",
        {"max_new_tokens": 3, "temperature": 0.0, "ignore_eos": True},
    )
    assert len(out["output_ids"]) == 3
