"""HTTP API tests: native /generate + OpenAI routes through a real engine
(reference pattern: `popen_launch_server` e2e tests, here in-process via
aiohttp's test utilities)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
aiohttp = pytest.importorskip("aiohttp")

from aiohttp.test_utils import TestClient, TestServer

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.entrypoints.http_server import HttpServer

VOCAB = 128


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
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
    d = tmp_path_factory.mktemp("http_model")
    model.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d),
        dtype="float32",
        tokenizer_mode="byte",
        page_size=4,
        max_total_tokens=8192,
        attention_backend="xla",
        random_seed=0,
    )
    yield e
    e.shutdown()


@pytest.fixture()
async def client(engine, loop):
    app = HttpServer(engine).build_app()
    server = TestServer(app)
    client = TestClient(server)
    await client.start_server()
    yield client
    await client.close()


async def test_health(client):
    resp = await client.get("/health")
    assert resp.status == 200
    resp = await client.get("/health_generate")
    assert resp.status == 200


async def test_model_info(client, engine):
    resp = await client.get("/get_model_info")
    data = await resp.json()
    assert data["is_generation"] is True
    assert data["model_path"] == engine.server_args.model_path


async def test_generate(client):
    resp = await client.post(
        "/generate",
        json={
            "input_ids": [5, 6, 7, 8],
            "sampling_params": {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True},
        },
    )
    assert resp.status == 200
    data = await resp.json()
    assert len(data["output_ids"]) == 6
    assert data["meta_info"]["finish_reason"]["type"] == "length"


async def test_generate_text_and_stream(client):
    resp = await client.post(
        "/generate",
        json={
            "text": "hello",
            "stream": True,
            "sampling_params": {"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True},
        },
    )
    assert resp.status == 200
    body = await resp.text()
    events = [l for l in body.split("\n\n") if l.startswith("data: ")]
    assert events[-1] == "data: [DONE]"
    last = json.loads(events[-2][len("data: "):])
    assert last["meta_info"]["finish_reason"] is not None


async def test_generate_bad_request(client):
    resp = await client.post("/generate", json={"sampling_params": {}})
    assert resp.status == 400
    resp = await client.post(
        "/generate",
        json={"text": "x", "sampling_params": {"temperature": -5}},
    )
    assert resp.status == 400


async def test_v1_completions(client):
    resp = await client.post(
        "/v1/completions",
        json={
            "model": "test",
            "prompt": "abc",
            "max_tokens": 4,
            "temperature": 0,
            "ignore_eos": True,
        },
    )
    assert resp.status == 200
    data = await resp.json()
    assert data["object"] == "text_completion"
    assert data["choices"][0]["finish_reason"] == "length"
    assert data["usage"]["completion_tokens"] == 4


async def test_v1_completions_missing_prompt(client):
    resp = await client.post("/v1/completions", json={"model": "test"})
    assert resp.status == 400
    data = await resp.json()
    assert "prompt" in data["error"]["message"]


async def test_v1_chat_completions(client):
    resp = await client.post(
        "/v1/chat/completions",
        json={
            "model": "test",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4,
            "temperature": 0,
            "ignore_eos": True,
        },
    )
    assert resp.status == 200
    data = await resp.json()
    assert data["object"] == "chat.completion"
    assert data["choices"][0]["message"]["role"] == "assistant"
    assert data["usage"]["completion_tokens"] == 4


async def test_v1_chat_stream(client):
    resp = await client.post(
        "/v1/chat/completions",
        json={
            "model": "test",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4,
            "temperature": 0,
            "ignore_eos": True,
            "stream": True,
            "stream_options": {"include_usage": True},
        },
    )
    assert resp.status == 200
    body = await resp.text()
    events = [l for l in body.split("\n\n") if l.startswith("data: ")]
    assert events[-1] == "data: [DONE]"
    usage_evt = json.loads(events[-2][len("data: "):])
    assert usage_evt["usage"]["completion_tokens"] == 4
    first = json.loads(events[0][len("data: "):])
    assert first["choices"][0]["delta"].get("role") == "assistant"


async def test_models_and_flush(client):
    resp = await client.get("/v1/models")
    data = await resp.json()
    assert data["data"][0]["object"] == "model"
    resp = await client.post("/flush_cache")
    assert resp.status == 200


async def test_metrics(client):
    resp = await client.get("/metrics")
    assert resp.status == 200
    text = await resp.text()
    assert "sglang:num_running_reqs" in text


async def test_v1_score(client):
    resp = await client.post(
        "/v1/score",
        json={"model": "m", "query": "abc", "items": ["de", "fg"]},
    )
    assert resp.status == 200
    data = await resp.json()
    assert len(data["scores"]) == 2
    assert all(s <= 0 for s in data["scores"])  # logprobs


async def test_v1_score_missing_fields(client):
    resp = await client.post("/v1/score", json={"query": "abc"})
    assert resp.status == 400


async def test_v1_rerank(client):
    resp = await client.post(
        "/v1/rerank",
        json={"model": "m", "query": "abc", "documents": ["dd", "ee", "ff"]},
    )
    assert resp.status == 200
    data = await resp.json()
    assert len(data["results"]) == 3
    scores = [r["relevance_score"] for r in data["results"]]
    assert scores == sorted(scores, reverse=True)
