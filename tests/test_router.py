"""Router/LB tests: policy behavior, the native C++ radix tree, health
quarantine, retries, metrics, PD orchestration, and real proxying over two
engine-backed servers (reference `sgl-router` py_test pattern)."""

import asyncio
import json

import aiohttp
import numpy as np

# xdist workers oversubscribe 4 CPUs; aiohttp's default 300s total
# client timeout then trips on long-poll + compile stalls
CLIENT_TIMEOUT = aiohttp.ClientTimeout(total=900)
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from aiohttp.test_utils import TestClient, TestServer

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.entrypoints.http_server import HttpServer
from sglang_npu_tpu.router.router import PrefixMap, Router

VOCAB = 128


# ----------------------------------------------------------------------
# native radix tree (csrc/radix_tree.cpp via ctypes)
# ----------------------------------------------------------------------
def test_cpp_radix_tree_basics():
    from sglang_npu_tpu.router.radix_tree import RadixTree

    t = RadixTree()
    t.insert("the quick brown fox jumps over", "w1")
    t.insert("the quick brown bear sleeps", "w2")
    n, w = t.prefix_match("the quick brown fox jumps over and on")
    assert w == "w1" and n == len("the quick brown fox jumps over")
    # shared-prefix-only query hits the deepest tenant node
    n, w = t.prefix_match("the quick brown ")
    assert w in ("w1", "w2") and n == len("the quick brown ")
    n, w = t.prefix_match("unrelated")
    assert w is None and n == 0


def test_cpp_radix_tree_eviction_and_removal():
    from sglang_npu_tpu.router.radix_tree import RadixTree

    t = RadixTree()
    for i in range(50):
        t.insert(f"prompt number {i} with some padding text", "w1")
    big = t.tenant_size("w1")
    assert big > 500
    t.evict("w1", 100)
    assert t.tenant_size("w1") <= 100
    t.insert("abcdef", "w2")
    t.remove_worker("w2")
    assert t.tenant_size("w2") == 0
    n, w = t.prefix_match("abcdef")
    assert w != "w2"


def test_cpp_radix_tree_insert_match_roundtrip():
    import random
    import string

    from sglang_npu_tpu.router.radix_tree import RadixTree

    random.seed(7)
    t = RadixTree()
    prompts = {}
    for i in range(300):
        p = "".join(
            random.choices(string.ascii_lowercase + " ", k=random.randint(5, 40))
        )
        u = f"w{random.randrange(4)}"
        t.insert(p, u)
        prompts[p] = u
    for p in prompts:
        n, w = t.prefix_match(p)
        assert n == len(p) and w is not None


# ----------------------------------------------------------------------
# policies
# ----------------------------------------------------------------------
def test_prefix_map_fallback():
    m = PrefixMap(chunk=4)
    m.insert("hello world this is a prompt", "w1")
    assert m.prefix_match("hello world different suffix")[1] == "w1"
    assert m.prefix_match("goodbye")[1] is None
    m.remove_worker("w1")
    assert m.prefix_match("hello world")[1] is None


def test_pick_worker_policies():
    r = Router(["a", "b", "c"], policy="round_robin")
    picks = [r.pick_worker(None) for _ in range(6)]
    assert picks == ["a", "b", "c", "a", "b", "c"]

    r = Router(["a", "b"], policy="shortest_queue")
    r.inflight = {"a": 5, "b": 1}
    assert r.pick_worker(None) == "b"

    r = Router(["a", "b"], policy="cache_aware")
    r.tree.insert("shared prefix text here we go", "b")
    assert r.pick_worker({"text": "shared prefix text here we go on"}) == "b"
    assert r.cache_hits == 1
    # miss -> shortest queue
    r.inflight = {"a": 0, "b": 3}
    assert r.pick_worker({"text": "brand new never seen"}) == "a"
    assert r.cache_misses == 1


def test_cache_aware_balance_guard():
    """Sticky routing yields to shortest-queue when the cluster is badly
    imbalanced (reference cache_aware.rs thresholds)."""
    r = Router(
        ["a", "b"], policy="cache_aware",
        balance_abs_threshold=4, balance_rel_threshold=1.1,
    )
    r.tree.insert("hot shared prefix workload", "b")
    r.inflight = {"a": 0, "b": 100}
    assert r.pick_worker({"text": "hot shared prefix workload x"}) == "a"
    r.inflight = {"a": 0, "b": 2}
    assert r.pick_worker({"text": "hot shared prefix workload x"}) == "b"


def test_quarantine_excluded_from_routing():
    r = Router(["a", "b"], policy="round_robin")
    r.quarantined.add("a")
    assert all(r.pick_worker(None) == "b" for _ in range(4))


# ----------------------------------------------------------------------
# e2e over real engine-backed workers
# ----------------------------------------------------------------------
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

    router = Router(urls, policy="round_robin", health_interval=0)
    rts = TestServer(router.build_app())
    client = TestClient(rts, timeout=CLIENT_TIMEOUT)
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

        # prometheus metrics
        resp = await client.get("/metrics")
        text = await resp.text()
        assert "sglang_router_requests_total" in text
        assert f'worker="{urls[0]}"' in text

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


async def test_router_retries_dead_worker(two_servers, loop):
    """A connection-refused worker is retried on a live one."""
    ts = TestServer(HttpServer(two_servers[0]).build_app())
    await ts.start_server()
    live = f"http://{ts.host}:{ts.port}"
    dead = "http://127.0.0.1:1"  # connection refused

    router = Router([dead, live], policy="round_robin",
                    retries=2, health_interval=0)
    client = TestClient(TestServer(router.build_app()), timeout=CLIENT_TIMEOUT)
    await client.start_server()
    try:
        # round_robin hits `dead` on at least one of two calls; both succeed
        for i in range(2):
            resp = await client.post(
                "/generate",
                json={
                    "text": f"retry {i}",
                    "sampling_params": {"max_new_tokens": 1, "temperature": 0.0, "ignore_eos": True},
                },
            )
            assert resp.status == 200
        assert router.retried >= 1
    finally:
        await client.close()
        await ts.close()


async def test_router_health_quarantine(two_servers, loop):
    ts = TestServer(HttpServer(two_servers[0]).build_app())
    await ts.start_server()
    live = f"http://{ts.host}:{ts.port}"
    dead = "http://127.0.0.1:1"
    router = Router([dead, live], policy="round_robin",
                    health_interval=0.1, health_failures=2)
    client = TestClient(TestServer(router.build_app()), timeout=CLIENT_TIMEOUT)
    await client.start_server()
    try:
        for _ in range(50):
            if dead in router.quarantined:
                break
            await asyncio.sleep(0.1)
        assert dead in router.quarantined
        assert live not in router.quarantined
        # routing now only targets the live worker
        for _ in range(3):
            assert router.pick_worker(None) == live
    finally:
        await client.close()
        await ts.close()


@pytest.mark.parametrize("transfer", ["proxy", "shm"])
async def test_router_pd_orchestration(tmp_path_factory, loop, transfer):
    """PD mode: /generate = prefill_only on a prefill worker + KV move to
    a decode worker (reference pd_router/mini_lb).  "proxy" relays the
    payload through the router; "shm" uses bootstrap rooms with a direct
    same-host /dev/shm push."""
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp(f"router_pd_model_{transfer}")
    hf.save_pretrained(d, safe_serialization=True)
    common = dict(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    prefill = Engine(**common, disaggregation_mode="prefill")
    decode = Engine(**common, disaggregation_mode="decode")
    tsp = TestServer(HttpServer(prefill).build_app())
    tsd = TestServer(HttpServer(decode).build_app())
    await tsp.start_server()
    await tsd.start_server()
    router = Router(
        [],
        policy="shortest_queue",
        pd_prefill_urls=[f"http://{tsp.host}:{tsp.port}"],
        pd_decode_urls=[f"http://{tsd.host}:{tsd.port}"],
        health_interval=0,
        pd_transfer=transfer,
    )
    client = TestClient(TestServer(router.build_app()), timeout=CLIENT_TIMEOUT)
    await client.start_server()
    try:
        prompt = np.random.default_rng(0).integers(3, VOCAB, size=9).tolist()
        resp = await client.post(
            "/generate",
            json={
                "input_ids": prompt,
                "sampling_params": {"max_new_tokens": 6, "temperature": 0.0},
            },
        )
        assert resp.status == 200, await resp.text()
        out = await resp.json()
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=6, do_sample=False
            )[0][len(prompt):].tolist()
        assert out["output_ids"] == ref
    finally:
        await client.close()
        await tsp.close()
        await tsd.close()
        prefill.shutdown()
        decode.shutdown()
