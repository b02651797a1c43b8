"""Cluster router / load balancer.

Counterpart of the reference's `sgl-router/` (Rust: `routers/router.rs`,
`routers/pd_router.rs`, `policies/{cache_aware,power_of_two,round_robin,
random}.rs`, `tree.rs`, `service_discovery.rs`) and the
`DataParallelController` dispatch modes.  The hot data structure — the
multi-tenant approximate radix tree behind cache-aware routing — is native
C++ (`csrc/radix_tree.cpp`, loaded via ctypes; the image has no Rust
toolchain), with a pure-Python fallback when no compiler is available.

Policies:
  * round_robin / random
  * shortest_queue  — least in-flight requests
  * power_of_two    — two random candidates, pick the less loaded
  * cache_aware     — radix-tree prefix affinity (reference
    `policies/cache_aware.rs`): if a worker already holds >= threshold of
    the prompt prefix AND the cluster is balanced, route sticky; else
    shortest_queue.  Per-worker tree footprints are LRU-evicted.

Resilience (reference `routers/router.rs` health checking + retries):
  * background health loop: consecutive /health failures quarantine a
    worker (kept for probing, skipped for routing); recovery reinstates it
  * per-request retries on a different worker for connection errors

PD mode (reference `pd_router.rs` / mini_lb): with --pd-prefill-urls and
--pd-decode-urls, /generate orchestrates the two-phase flow: prefill
worker (cache-aware) -> /prefill_only -> decode worker (shortest queue)
-> /receive_prefill -> response.

Observability: /metrics (Prometheus text format).
"""

from __future__ import annotations

import argparse
import asyncio
import itertools
import json
import logging
import random
import time
from typing import Dict, List, Optional, Tuple

import aiohttp
from aiohttp import web

logger = logging.getLogger(__name__)

PROXY_ROUTES = [
    "/generate",
    "/encode",
    "/v1/completions",
    "/v1/chat/completions",
    "/v1/embeddings",
    "/flush_cache",
]


class PrefixMap:
    """Pure-Python fallback affinity map (chunked prefixes, LRU cap) used
    when the C++ radix tree cannot be built."""

    def __init__(self, chunk: int = 16, cap: int = 4096):
        self.chunk = chunk
        self.cap = cap
        self.map: Dict[str, Tuple[str, float]] = {}

    def _chunks(self, text: str):
        limit = min(len(text), self.chunk * 16)
        for end in range(self.chunk, limit + 1, self.chunk):
            yield text[:end]

    def prefix_match(self, text: str) -> Tuple[int, Optional[str]]:
        best, blen = None, 0
        for c in self._chunks(text):
            hit = self.map.get(c)
            if hit:
                best, blen = hit[0], len(c)
        return blen, best

    def insert(self, text: str, worker: str):
        now = time.time()
        for c in self._chunks(text):
            self.map[c] = (worker, now)
        if len(self.map) > self.cap:
            for k, _ in sorted(self.map.items(), key=lambda kv: kv[1][1])[
                : len(self.map) - self.cap
            ]:
                self.map.pop(k, None)

    def evict(self, worker: str, max_chars: int):
        pass

    def remove_worker(self, worker: str):
        self.map = {k: v for k, v in self.map.items() if v[0] != worker}


def _make_tree():
    try:
        from sglang_npu_tpu.router.radix_tree import RadixTree

        return RadixTree()
    except Exception as e:
        logger.warning("cache-aware tree: python fallback (%s)", e)
        return PrefixMap()


class Router:
    def __init__(
        self,
        worker_urls: List[str],
        policy: str = "round_robin",
        pd_prefill_urls: Optional[List[str]] = None,
        pd_decode_urls: Optional[List[str]] = None,
        cache_threshold: float = 0.5,
        balance_abs_threshold: int = 32,
        balance_rel_threshold: float = 1.5,
        max_tree_chars_per_worker: int = 2 ** 24,
        retries: int = 2,
        health_interval: float = 10.0,
        health_failures: int = 3,
        pd_transfer: str = "proxy",
    ):
        self.workers: List[str] = [w.rstrip("/") for w in worker_urls]
        self.policy = policy
        self.pd_prefill = [w.rstrip("/") for w in (pd_prefill_urls or [])]
        self.pd_decode = [w.rstrip("/") for w in (pd_decode_urls or [])]
        # KV transfer engine for PD pairs: "proxy" relays the payload
        # through the router (legacy); "http"/"shm"/"fake" use
        # bootstrap rooms with direct prefill->decode pushes
        # (disaggregation/, reference mooncake room handshake)
        self.pd_transfer = pd_transfer
        self.inflight: Dict[str, int] = {w: 0 for w in self._all_workers()}
        self.total: Dict[str, int] = {w: 0 for w in self._all_workers()}
        self.retried: int = 0
        self.cache_hits = 0
        self.cache_misses = 0
        self._rr = itertools.count()
        self.tree = _make_tree()
        self.cache_threshold = cache_threshold
        self.balance_abs = balance_abs_threshold
        self.balance_rel = balance_rel_threshold
        self.max_tree_chars = max_tree_chars_per_worker
        self.retries = retries
        self.health_interval = health_interval
        self.health_failures = health_failures
        self._fail_count: Dict[str, int] = {}
        self.quarantined: set = set()
        self.session: Optional[aiohttp.ClientSession] = None
        self._health_task = None
        # optional ServiceDiscovery (k8s pod watch / file watch) attached
        # before build_app (reference sgl-router service_discovery.rs)
        self.discovery = None

    def _all_workers(self):
        return self.workers + self.pd_prefill + self.pd_decode

    # ------------------------------------------------------------------
    def _healthy(self, pool: List[str]) -> List[str]:
        live = [w for w in pool if w not in self.quarantined]
        return live or pool  # never empty the pool entirely

    def _shortest(self, pool: List[str]) -> str:
        return min(pool, key=lambda w: self.inflight.get(w, 0))

    def _balanced(self, pool: List[str]) -> bool:
        """Cluster considered balanced unless the spread exceeds BOTH the
        absolute and relative thresholds (reference cache_aware.rs)."""
        loads = [self.inflight.get(w, 0) for w in pool]
        lo, hi = min(loads), max(loads)
        return not (hi - lo > self.balance_abs and hi > self.balance_rel * (lo + 1))

    def pick_worker(self, body: Optional[dict], pool=None) -> str:
        pool = self._healthy(pool if pool is not None else self.workers)
        if not pool:
            raise web.HTTPServiceUnavailable(text="no workers")
        if self.policy == "round_robin":
            return pool[next(self._rr) % len(pool)]
        if self.policy == "random":
            return random.choice(pool)
        if self.policy == "power_of_two":
            a, b = random.sample(pool, k=min(2, len(pool)))
            return a if self.inflight.get(a, 0) <= self.inflight.get(b, 0) else b
        if self.policy == "cache_aware" and body:
            text = body.get("text")
            if isinstance(text, str) and self._balanced(pool):
                matched, hit = self.tree.prefix_match(text)
                if hit in pool and matched >= self.cache_threshold * len(text):
                    self.cache_hits += 1
                    return hit
            self.cache_misses += 1
        return self._shortest(pool)

    def _note_routed(self, body, worker):
        if self.policy == "cache_aware" and body:
            text = body.get("text")
            if isinstance(text, str):
                self.tree.insert(text, worker)
                self.tree.evict(worker, self.max_tree_chars)

    # ------------------------------------------------------------------
    async def proxy(self, request: web.Request) -> web.StreamResponse:
        raw = await request.read()
        body = None
        if raw:
            try:
                body = json.loads(raw)
            except json.JSONDecodeError:
                pass
        if self.pd_prefill and self.pd_decode and request.path == "/generate":
            return await self._pd_generate(request, raw, body)
        tried: set = set()
        last_err = None
        for attempt in range(self.retries + 1):
            pool = [w for w in self._healthy(self.workers) if w not in tried]
            if not pool:
                break
            worker = self.pick_worker(body, pool)
            tried.add(worker)
            self._note_routed(body, worker)
            self.inflight[worker] = self.inflight.get(worker, 0) + 1
            self.total[worker] = self.total.get(worker, 0) + 1
            try:
                async with self.session.post(
                    worker + request.path, data=raw,
                    headers={"Content-Type": "application/json"},
                ) as upstream:
                    resp = web.StreamResponse(
                        status=upstream.status,
                        headers={
                            "Content-Type": upstream.headers.get(
                                "Content-Type", "application/json"
                            )
                        },
                    )
                    await resp.prepare(request)
                    async for chunk in upstream.content.iter_any():
                        await resp.write(chunk)
                    await resp.write_eof()
                    return resp
            except aiohttp.ClientError as e:
                last_err = e
                self.retried += 1
                logger.warning(
                    "worker %s failed (attempt %d): %s", worker, attempt, e
                )
            finally:
                self.inflight[worker] = max(self.inflight.get(worker, 1) - 1, 0)
        return web.json_response(
            {"error": {"message": f"all workers failed: {last_err}"}},
            status=502,
        )

    # ------------------------------------------------------------------
    async def _pd_generate(self, request, raw, body) -> web.StreamResponse:
        """PD orchestration (reference pd_router.rs / mini_lb): prefill on
        a prefill worker, move the KV to a decode worker, return the
        decode result.  With a room-based transfer engine the KV bytes
        go DIRECTLY prefill->decode; the router only coordinates."""
        pw = self.pick_worker(body, self.pd_prefill)
        self._note_routed(body, pw)
        dw = self._shortest(self._healthy(self.pd_decode))
        for w in (pw, dw):
            self.inflight[w] = self.inflight.get(w, 0) + 1
            self.total[w] = self.total.get(w, 0) + 1
        if self.pd_transfer != "proxy":
            try:
                return await self._pd_generate_rooms(body, pw, dw)
            except aiohttp.ClientError as e:
                return web.json_response(
                    {"error": {"message": f"pd pipeline failed: {e}"}},
                    status=502,
                )
            finally:
                for w in (pw, dw):
                    self.inflight[w] = max(self.inflight.get(w, 1) - 1, 0)
        try:
            async with self.session.post(
                pw + "/prefill_only", data=raw,
                headers={"Content-Type": "application/json"},
            ) as pre:
                if pre.status != 200:
                    return web.json_response(
                        {"error": {"message": await pre.text()}},
                        status=pre.status,
                    )
                kv_body = await pre.read()
                hdrs = {
                    "X-Rid": pre.headers.get("X-Rid", ""),
                    "X-Kv-Dtype": pre.headers.get("X-Kv-Dtype", "bfloat16"),
                    "X-Sampling-Params": json.dumps(
                        (body or {}).get("sampling_params", {})
                    ),
                }
            async with self.session.post(
                dw + "/receive_prefill", data=kv_body, headers=hdrs
            ) as dec:
                return web.json_response(
                    await dec.json(), status=dec.status
                )
        except aiohttp.ClientError as e:
            return web.json_response(
                {"error": {"message": f"pd pipeline failed: {e}"}}, status=502
            )
        finally:
            for w in (pw, dw):
                self.inflight[w] = max(self.inflight.get(w, 1) - 1, 0)

    async def _pd_generate_rooms(self, body, pw: str, dw: str):
        """Room-based PD flow: register the room on the decode worker
        (long-poll), tell the prefill worker to push the KV straight to
        it, then relay the decode result."""
        import uuid as _uuid

        room = _uuid.uuid4().hex
        sp = (body or {}).get("sampling_params", {})
        reg = asyncio.create_task(
            self.session.post(
                dw + "/pd_register",
                json={"room": room, "sampling_params": sp},
            )
        )
        try:
            async with self.session.post(
                pw + "/prefill_only",
                json={
                    "input_ids": (body or {}).get("input_ids"),
                    "sampling_params": sp,
                    "room": room,
                    "decode_url": dw,
                    "transfer": self.pd_transfer,
                },
            ) as pre:
                if pre.status != 200:
                    reg.cancel()
                    return web.json_response(
                        {"error": {"message": await pre.text()}},
                        status=pre.status,
                    )
        except BaseException:
            reg.cancel()
            raise
        dec = await reg
        async with dec:
            return web.json_response(await dec.json(), status=dec.status)

    # ------------------------------------------------------------------
    async def _health_loop(self):
        """Quarantine workers after consecutive health failures; reinstate
        on recovery (reference service discovery + health checker)."""
        while True:
            await asyncio.sleep(self.health_interval)
            for w in list(self._all_workers()):
                try:
                    async with self.session.get(
                        w + "/health",
                        timeout=aiohttp.ClientTimeout(total=5),
                    ) as r:
                        ok = r.status == 200
                except Exception:
                    ok = False
                if ok:
                    self._fail_count[w] = 0
                    if w in self.quarantined:
                        self.quarantined.discard(w)
                        logger.info("worker %s recovered", w)
                else:
                    self._fail_count[w] = self._fail_count.get(w, 0) + 1
                    if (
                        self._fail_count[w] >= self.health_failures
                        and w not in self.quarantined
                    ):
                        self.quarantined.add(w)
                        if hasattr(self.tree, "remove_worker"):
                            self.tree.remove_worker(w)
                        logger.warning("worker %s quarantined", w)

    # ------------------------------------------------------------------
    async def add_worker(self, request: web.Request) -> web.Response:
        body = await request.json()
        url = body["url"].rstrip("/")
        pool = {
            "prefill": self.pd_prefill,
            "decode": self.pd_decode,
        }.get(body.get("role", ""), self.workers)
        if url not in pool:
            pool.append(url)
            self.inflight.setdefault(url, 0)
        return web.json_response({"workers": self._all_workers()})

    async def remove_worker(self, request: web.Request) -> web.Response:
        body = await request.json()
        url = body["url"].rstrip("/")
        self.workers = [w for w in self.workers if w != url]
        self.pd_prefill = [w for w in self.pd_prefill if w != url]
        self.pd_decode = [w for w in self.pd_decode if w != url]
        self.tree.remove_worker(url)
        self.quarantined.discard(url)
        return web.json_response({"workers": self._all_workers()})

    async def list_workers(self, request: web.Request) -> web.Response:
        return web.json_response(
            {
                "workers": self.workers,
                "pd_prefill": self.pd_prefill,
                "pd_decode": self.pd_decode,
                "quarantined": sorted(self.quarantined),
                "inflight": self.inflight,
                "total_requests": self.total,
                "policy": self.policy,
                "tree_native": type(self.tree).__name__ == "RadixTree",
            }
        )

    async def metrics(self, request: web.Request) -> web.Response:
        """Prometheus text exposition (reference sgl-router metrics)."""
        lines = [
            "# TYPE sglang_router_requests_total counter",
        ]
        for w, n in self.total.items():
            lines.append(
                f'sglang_router_requests_total{{worker="{w}"}} {n}'
            )
        lines.append("# TYPE sglang_router_inflight gauge")
        for w, n in self.inflight.items():
            lines.append(f'sglang_router_inflight{{worker="{w}"}} {n}')
        lines += [
            "# TYPE sglang_router_retries_total counter",
            f"sglang_router_retries_total {self.retried}",
            "# TYPE sglang_router_cache_hits_total counter",
            f"sglang_router_cache_hits_total {self.cache_hits}",
            "# TYPE sglang_router_cache_misses_total counter",
            f"sglang_router_cache_misses_total {self.cache_misses}",
            "# TYPE sglang_router_quarantined gauge",
            f"sglang_router_quarantined {len(self.quarantined)}",
        ]
        return web.Response(
            text="\n".join(lines) + "\n", content_type="text/plain"
        )

    async def health(self, request: web.Request) -> web.Response:
        return web.Response(status=200)

    # ------------------------------------------------------------------
    def build_app(self) -> web.Application:
        app = web.Application(client_max_size=256 * 1024 * 1024)
        for route in PROXY_ROUTES:
            app.router.add_post(route, self.proxy)
        app.router.add_get("/health", self.health)
        app.router.add_post("/add_worker", self.add_worker)
        app.router.add_post("/remove_worker", self.remove_worker)
        app.router.add_get("/list_workers", self.list_workers)
        app.router.add_get("/metrics", self.metrics)

        async def on_startup(app):
            self.session = aiohttp.ClientSession(
                timeout=aiohttp.ClientTimeout(total=None)
            )
            if self.health_interval > 0:
                self._health_task = asyncio.create_task(self._health_loop())
            if self.discovery is not None:
                self.discovery.start()

        async def on_cleanup(app):
            if self._health_task:
                self._health_task.cancel()
            if self.discovery is not None:
                self.discovery.stop()
            if self.session:
                await self.session.close()

        app.on_startup.append(on_startup)
        app.on_cleanup.append(on_cleanup)
        return app


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--worker-urls", nargs="*", default=[])
    p.add_argument("--pd-prefill-urls", nargs="*", default=[])
    p.add_argument("--pd-decode-urls", nargs="*", default=[])
    p.add_argument(
        "--policy",
        default="cache_aware",
        choices=["round_robin", "random", "shortest_queue", "power_of_two", "cache_aware"],
    )
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=30080)
    p.add_argument("--cache-threshold", type=float, default=0.5)
    p.add_argument("--retries", type=int, default=2)
    p.add_argument("--health-interval", type=float, default=10.0)
    p.add_argument(
        "--pd-transfer",
        default="proxy",
        choices=["proxy", "http", "shm", "fake"],
        help="PD KV transfer engine: proxy relays bytes through the "
        "router; http/shm push directly prefill->decode via bootstrap "
        "rooms (shm = same-host /dev/shm fast path)",
    )
    # service discovery (reference sgl-router service_discovery.rs)
    p.add_argument("--service-discovery", action="store_true",
                   help="discover workers from the Kubernetes pod API")
    p.add_argument("--k8s-namespace", default="default")
    p.add_argument("--k8s-selector", default="",
                   help="labelSelector for regular workers, e.g. app=sglang")
    p.add_argument("--k8s-prefill-selector", default="")
    p.add_argument("--k8s-decode-selector", default="")
    p.add_argument("--k8s-port", type=int, default=30000)
    p.add_argument("--k8s-api-base", default=None,
                   help="override the API endpoint (tests / out-of-cluster)")
    p.add_argument("--discovery-watch-file", default=None,
                   help="poll a JSON file of worker URLs instead of k8s")
    p.add_argument("--discovery-interval", type=float, default=10.0)
    args = p.parse_args(argv)
    router = Router(
        args.worker_urls,
        args.policy,
        pd_prefill_urls=args.pd_prefill_urls,
        pd_decode_urls=args.pd_decode_urls,
        cache_threshold=args.cache_threshold,
        retries=args.retries,
        health_interval=args.health_interval,
        pd_transfer=args.pd_transfer,
    )
    if args.service_discovery or args.discovery_watch_file:
        from sglang_npu_tpu.router.service_discovery import (
            FileSource,
            KubernetesSource,
            ServiceDiscovery,
        )

        if args.discovery_watch_file:
            src = FileSource(args.discovery_watch_file)
        else:
            src = KubernetesSource(
                namespace=args.k8s_namespace,
                selector=args.k8s_selector,
                prefill_selector=args.k8s_prefill_selector,
                decode_selector=args.k8s_decode_selector,
                port=args.k8s_port,
                api_base=args.k8s_api_base,
            )
        router.discovery = ServiceDiscovery(
            router, src, args.discovery_interval
        )
    web.run_app(router.build_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
