"""Cluster router / load balancer.

Counterpart of the reference's `sgl-router/` (Rust: `routers/router.rs`,
`policies/{cache_aware,power_of_two,round_robin,random}.rs`,
`service_discovery.rs`) and the `DataParallelController` dispatch modes
(round_robin / shortest_queue).  This is the Python implementation; the
environment has no Rust toolchain, and a C++ port of this daemon is the
planned follow-up (SURVEY.md §2.9).

Policies:
  * round_robin
  * random
  * shortest_queue  — least in-flight requests
  * cache_aware     — sticky prefix routing: an approximate radix of recent
    prompt prefixes maps requests with a shared prefix to the worker that
    already holds its KV (falls back to shortest_queue on miss; reference
    `tree.rs` approximate radix tree)

Endpoints: proxied worker API (`/generate`, `/v1/*`, ...) plus
`/add_worker`, `/remove_worker`, `/list_workers`, `/health`.
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
    """Approximate prefix->worker affinity (reference `tree.rs`): keeps the
    first N tokens/chars of recent prompts per worker in a flat dict of
    chunked prefixes with LRU size cap."""

    def __init__(self, chunk: int = 16, cap: int = 4096):
        self.chunk = chunk
        self.cap = cap
        self.map: Dict[str, Tuple[str, float]] = {}

    def _chunks(self, text: str):
        # only full-length prefixes: partial tails would never align between
        # insert and lookup
        limit = min(len(text), self.chunk * 16)
        for end in range(self.chunk, limit + 1, self.chunk):
            yield text[:end]

    def lookup(self, text: str) -> Optional[str]:
        best = None
        for c in self._chunks(text):
            hit = self.map.get(c)
            if hit:
                best = hit[0]
        return best

    def insert(self, text: str, worker: str):
        now = time.time()
        for c in self._chunks(text):
            self.map[c] = (worker, now)
        if len(self.map) > self.cap:
            for k, _ in sorted(self.map.items(), key=lambda kv: kv[1][1])[
                : len(self.map) - self.cap
            ]:
                self.map.pop(k, None)

    def drop_worker(self, worker: str):
        self.map = {k: v for k, v in self.map.items() if v[0] != worker}


class Router:
    def __init__(self, worker_urls: List[str], policy: str = "round_robin"):
        self.workers: List[str] = list(worker_urls)
        self.policy = policy
        self.inflight: Dict[str, int] = {w: 0 for w in self.workers}
        self.total: Dict[str, int] = {w: 0 for w in self.workers}
        self._rr = itertools.count()
        self.prefix_map = PrefixMap()
        self.session: Optional[aiohttp.ClientSession] = None

    # ------------------------------------------------------------------
    def pick_worker(self, body: Optional[dict]) -> str:
        if not self.workers:
            raise web.HTTPServiceUnavailable(text="no workers")
        if self.policy == "round_robin":
            return self.workers[next(self._rr) % len(self.workers)]
        if self.policy == "random":
            return random.choice(self.workers)
        if self.policy == "power_of_two":
            a, b = random.sample(self.workers, k=min(2, len(self.workers)))
            return a if self.inflight.get(a, 0) <= self.inflight.get(b, 0) else b
        if self.policy == "cache_aware" and body:
            text = body.get("text")
            if isinstance(text, str):
                hit = self.prefix_map.lookup(text)
                if hit and hit in self.inflight:
                    return hit
        # shortest_queue (also the cache_aware fallback)
        return min(self.workers, key=lambda w: self.inflight.get(w, 0))

    # ------------------------------------------------------------------
    async def proxy(self, request: web.Request) -> web.StreamResponse:
        raw = await request.read()
        body = None
        if raw:
            try:
                body = json.loads(raw)
            except json.JSONDecodeError:
                pass
        worker = self.pick_worker(body)
        if (
            self.policy == "cache_aware"
            and body
            and isinstance(body.get("text"), str)
        ):
            self.prefix_map.insert(body["text"], worker)
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
            logger.warning("worker %s failed: %s", worker, e)
            return web.json_response(
                {"error": {"message": f"worker {worker} unreachable: {e}"}},
                status=502,
            )
        finally:
            self.inflight[worker] = max(self.inflight.get(worker, 1) - 1, 0)

    # ------------------------------------------------------------------
    async def add_worker(self, request: web.Request) -> web.Response:
        body = await request.json()
        url = body["url"].rstrip("/")
        if url not in self.workers:
            self.workers.append(url)
            self.inflight.setdefault(url, 0)
        return web.json_response({"workers": self.workers})

    async def remove_worker(self, request: web.Request) -> web.Response:
        body = await request.json()
        url = body["url"].rstrip("/")
        self.workers = [w for w in self.workers if w != url]
        self.prefix_map.drop_worker(url)
        return web.json_response({"workers": self.workers})

    async def list_workers(self, request: web.Request) -> web.Response:
        return web.json_response(
            {
                "workers": self.workers,
                "inflight": self.inflight,
                "total_requests": self.total,
                "policy": self.policy,
            }
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

        async def on_startup(app):
            self.session = aiohttp.ClientSession(
                timeout=aiohttp.ClientTimeout(total=None)
            )

        async def on_cleanup(app):
            if self.session:
                await self.session.close()

        app.on_startup.append(on_startup)
        app.on_cleanup.append(on_cleanup)
        return app


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--worker-urls", nargs="+", required=True)
    p.add_argument(
        "--policy",
        default="cache_aware",
        choices=["round_robin", "random", "shortest_queue", "power_of_two", "cache_aware"],
    )
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=30080)
    args = p.parse_args(argv)
    router = Router(args.worker_urls, args.policy)
    web.run_app(router.build_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
