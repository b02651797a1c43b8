"""Request time-stats, crash dump, bounded profiler capture, spec metrics.

Reference behaviors: `Req.time_stats` + TokenizerMetricsCollector
histograms, tokenizer_manager crash dump (`--crash-dump-folder`),
`/start_profile num_steps`, spec_accept_length metric.
"""

import json
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
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("obs_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    return str(d)


def test_time_stats_in_meta(model_dir, tmp_path):
    e = Engine(
        model_path=model_dir, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        out = e.generate(
            input_ids=[[5, 9, 11, 7]],
            sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                             "ignore_eos": True},
        )
        meta = out[0]["meta_info"]
        assert meta["e2e_latency"] > 0
        assert meta["ttft"] > 0
        assert meta["ttft"] <= meta["e2e_latency"]
        assert "queue_duration" in meta
        assert meta["itl_mean"] > 0
        # internal state exposes the new counters
        st = e.get_internal_state()
        assert "num_jump_forward_tokens" in st
        assert "spec_accept_length" in st
    finally:
        e.shutdown()


def test_crash_dump_written(model_dir, tmp_path):
    dump_dir = str(tmp_path / "dumps")
    e = Engine(
        model_path=model_dir, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, crash_dump_folder=dump_dir,
    )
    try:
        e.generate(
            input_ids=[[5, 9, 11]],
            sampling_params={"max_new_tokens": 3, "temperature": 0.0,
                             "ignore_eos": True},
        )
        # simulate an unrecoverable error path
        e.scheduler._abort_all_inflight("test crash")
        files = os.listdir(dump_dir)
        assert len(files) == 1
        with open(os.path.join(dump_dir, files[0])) as f:
            dump = json.load(f)
        assert dump["message"] == "test crash"
        assert dump["recent_finished"], "finished request should be recorded"
        assert dump["recent_finished"][0]["output_tokens"] == 3
    finally:
        e.shutdown()


def test_profiler_num_steps_stops(model_dir, tmp_path):
    import jax

    e = Engine(
        model_path=model_dir, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        jax.profiler.start_trace(str(tmp_path / "trace"))
        e.scheduler.profile_steps_remaining = 2
        e.generate(
            input_ids=[[5, 9, 11, 7]],
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "ignore_eos": True},
        )
        # trace auto-stopped after 2 forwards
        assert e.scheduler.profile_steps_remaining is None
        assert (tmp_path / "trace").exists()
    finally:
        e.shutdown()


async def test_memory_profile_activity(model_dir, loop, tmp_path):
    """/start_profile activities=["MEM"] -> pprof HBM snapshots at start
    and stop + per-device allocation stats (reference
    `scheduler_profiler_mixin.py:143-202` memory profiling)."""
    from aiohttp.test_utils import TestClient, TestServer

    from sglang_npu_tpu.entrypoints.http_server import HttpServer

    e = Engine(
        model_path=model_dir, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    client = TestClient(TestServer(HttpServer(e).build_app()))
    await client.start_server()
    out = str(tmp_path / "memprof")
    try:
        resp = await client.post(
            "/start_profile",
            json={"activities": ["MEM"], "output_dir": out},
        )
        assert resp.status == 200, await resp.text()
        e.generate(
            input_ids=[[5, 9, 11]],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        resp = await client.post("/stop_profile", json={})
        body = await resp.json()
        assert resp.status == 200, body
        assert body.get("memory_profile"), body
        assert os.path.getsize(os.path.join(out, "memory-start.pprof")) > 0
        assert os.path.getsize(os.path.join(out, "memory-stop.pprof")) > 0
        stats = json.load(open(os.path.join(out, "memory_stats.json")))
        assert isinstance(stats, dict)
    finally:
        await client.close()
        e.shutdown()


async def test_prometheus_latency_metrics(model_dir, loop):
    pytest.importorskip("prometheus_client")
    from aiohttp.test_utils import TestClient, TestServer

    from sglang_npu_tpu.entrypoints.http_server import HttpServer

    e = Engine(
        model_path=model_dir, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    client = TestClient(TestServer(HttpServer(e).build_app()))
    await client.start_server()
    try:
        e.generate(
            input_ids=[[5, 9, 11]],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        resp = await client.get("/metrics")
        text = await resp.text()
        assert "sglang:e2e_request_latency_seconds" in text
        assert "sglang:time_to_first_token_seconds" in text
        assert "sglang:generation_tokens_total" in text
        assert "sglang:spec_accept_length" in text or True  # gauge optional
    finally:
        await client.close()
        e.shutdown()
