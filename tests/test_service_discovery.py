"""Router service discovery (reference `sgl-router/src/service_discovery.rs`):
k8s pod-list reconciliation against a mocked API server, and the
watch-file source."""

import asyncio
import json

import pytest
from aiohttp import web

from sglang_npu_tpu.router.router import Router
from sglang_npu_tpu.router.service_discovery import (
    FileSource,
    KubernetesSource,
    ServiceDiscovery,
)


def _pod(ip, ready=True, port=None):
    p = {
        "metadata": {"annotations": {}},
        "status": {
            "podIP": ip,
            "conditions": [
                {"type": "Ready", "status": "True" if ready else "False"}
            ],
        },
    }
    if port:
        p["metadata"]["annotations"]["sglang.ai/port"] = str(port)
    return p


async def test_k8s_source_reconciles(aiohttp_client, loop):
    pods = {
        "app=sglang": [_pod("10.0.0.1"), _pod("10.0.0.2", ready=False)],
        "app=sglang-prefill": [_pod("10.0.1.1", port=31000)],
    }

    async def list_pods(request):
        sel = request.query["labelSelector"]
        assert request.headers.get("Authorization") == "Bearer tok"
        return web.json_response({"items": pods.get(sel, [])})

    app = web.Application()
    app.router.add_get("/api/v1/namespaces/ns1/pods", list_pods)
    client = await aiohttp_client(app)

    router = Router(["http://old:1"], policy="round_robin",
                    health_interval=0)
    router.session = client.session
    src = KubernetesSource(
        namespace="ns1",
        selector="app=sglang",
        prefill_selector="app=sglang-prefill",
        port=30000,
        api_base=f"http://{client.host}:{client.port}",
        token="tok",
    )
    sd = ServiceDiscovery(router, src, interval=0.1)
    desired = await src.fetch(router.session)
    sd.reconcile(desired)
    # ready pod added, unready excluded, stale worker removed
    assert router.workers == ["http://10.0.0.1:30000"]
    # prefill pool uses its own selector + annotation port override
    assert router.pd_prefill == ["http://10.0.1.1:31000"]
    # decode selector unset -> pool untouched
    assert router.pd_decode == []

    # pod churn: scale up + the old pod goes away
    pods["app=sglang"] = [_pod("10.0.0.3")]
    sd.reconcile(await src.fetch(router.session))
    assert router.workers == ["http://10.0.0.3:30000"]


async def test_file_source(tmp_path, loop):
    f = tmp_path / "workers.json"
    f.write_text(json.dumps({"workers": ["http://a:1", "http://b:2"]}))
    router = Router([], policy="round_robin", health_interval=0)
    src = FileSource(str(f))
    sd = ServiceDiscovery(router, src, interval=0.1)
    sd.reconcile(await src.fetch(None))
    assert router.workers == ["http://a:1", "http://b:2"]
    f.write_text(json.dumps({"workers": ["http://b:2"]}))
    sd.reconcile(await src.fetch(None))
    assert router.workers == ["http://b:2"]
