"""Router/LB tests: policy behavior + real proxying over two engine-backed
servers (reference `sgl-router` py_test pattern with mock workers)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from aiohttp.test_utils import TestClient, TestServer

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.entrypoints.http_server import HttpServer
from sglang_npu_tpu.router.router import PrefixMap, Router

VOCAB = 128


def test_prefix_map():
    m = PrefixMap(chunk=4)
    m.insert("hello world this is a prompt", "w1")
    assert m.lookup("hello world different suffix") == "w1"
    assert m.lookup("goodbye") is None
    m.drop_worker("w1")
    assert m.lookup("hello world") is None


def test_pick_worker_policies():
    r = Router(["a", "b", "c"], policy="round_robin")
    picks = [r.pick_worker(None) for _ in range(6)]
    assert picks == ["a", "b", "c", "a", "b", "c"]

    r = Router(["a", "b"], policy="shortest_queue")
    r.inflight = {"a": 5, "b": 1}
    assert r.pick_worker(None) == "b"

    r = Router(["a", "b"], policy="cache_aware")
    r.prefix_map.insert("shared prefix text here we go", "b")
    assert r.pick_worker({"text": "shared prefix text here and more"}) == "b"
    # miss -> shortest queue
    r.inflight = {"a": 0, "b": 9}
    assert r.pick_worker({"text": "brand new"}) == "a"


@pytest.fixture(scope="module")
def two_servers(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("router_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(d, safe_serialization=True)
    engines = [
        Engine(
            model_path=str(d), dtype="float32", tokenizer_mode="byte",
            page_size=4, max_total_tokens=2048, attention_backend="xla",
            random_seed=0,
        )
        for _ in range(2)
    ]
    yield engines
    for e in engines:
        e.shutdown()


async def test_router_proxies_and_balances(two_servers, loop):
    servers = []
    urls = []
    for eng in two_servers:
        ts = TestServer(HttpServer(eng).build_app())
        await ts.start_server()
        servers.append(ts)
        urls.append(f"http://{ts.host}:{ts.port}")

    router = Router(urls, policy="round_robin")
    rts = TestServer(router.build_app())
    client = TestClient(rts)
    await client.start_server()
    try:
        for i in range(4):
            resp = await client.post(
                "/generate",
                json={
                    "text": f"prompt {i}",
                    "sampling_params": {"max_new_tokens": 2, "temperature": 0.0, "ignore_eos": True},
                },
            )
            assert resp.status == 200
            data = await resp.json()
            assert len(data["output_ids"]) == 2
        resp = await client.get("/list_workers")
        stats = await resp.json()
        assert stats["total_requests"][urls[0]] == 2
        assert stats["total_requests"][urls[1]] == 2

        # dynamic worker remove
        resp = await client.post("/remove_worker", json={"url": urls[1]})
        assert (await resp.json())["workers"] == [urls[0]]
        resp = await client.post(
            "/generate",
            json={
                "text": "after removal",
                "sampling_params": {"max_new_tokens": 1, "temperature": 0.0, "ignore_eos": True},
            },
        )
        assert resp.status == 200
    finally:
        await client.close()
        for ts in servers:
            await ts.close()
