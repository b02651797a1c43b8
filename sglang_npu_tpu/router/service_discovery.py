"""Router service discovery (reference `sgl-router/src/service_discovery.rs`).

Reconciles the router's worker pools against an external source of truth
on an interval — workers join/leave the cluster without manual
/add_worker calls:

  * **Kubernetes**: list pods by labelSelector (separate selectors for
    regular / PD-prefill / PD-decode pools), take Ready pods' podIPs.
    In-cluster config (serviceaccount token + CA) is picked up
    automatically; `api_base`/`token` are injectable for tests and
    out-of-cluster use.  The reference watches the pod API; polling the
    list endpoint gives the same reconciliation with ~interval latency
    and no watch-reconnect machinery.
  * **Watch file**: JSON {"workers": [...], "prefill": [...],
    "decode": [...]} — the lowest-common-denominator hook for any
    orchestrator that can write a file.
"""

from __future__ import annotations

import asyncio
import json
import logging
import os
import ssl
from typing import Dict, List, Optional

import aiohttp

logger = logging.getLogger(__name__)

SA_DIR = "/var/run/secrets/kubernetes.io/serviceaccount"


class KubernetesSource:
    def __init__(
        self,
        namespace: str = "default",
        selector: str = "",
        prefill_selector: str = "",
        decode_selector: str = "",
        port: int = 30000,
        api_base: Optional[str] = None,
        token: Optional[str] = None,
    ):
        self.namespace = namespace
        self.selectors = {
            "workers": selector,
            "prefill": prefill_selector,
            "decode": decode_selector,
        }
        self.port = port
        host = os.environ.get("KUBERNETES_SERVICE_HOST")
        kport = os.environ.get("KUBERNETES_SERVICE_PORT", "443")
        self.api_base = api_base or (
            f"https://{host}:{kport}" if host else None
        )
        if token is None and os.path.exists(os.path.join(SA_DIR, "token")):
            with open(os.path.join(SA_DIR, "token")) as f:
                token = f.read().strip()
        self.token = token
        self.ssl_ctx = None
        ca = os.path.join(SA_DIR, "ca.crt")
        if self.api_base and self.api_base.startswith("https") and os.path.exists(ca):
            self.ssl_ctx = ssl.create_default_context(cafile=ca)

    async def fetch(self, session: aiohttp.ClientSession) -> Dict[str, List[str]]:
        if not self.api_base:
            raise RuntimeError(
                "no Kubernetes API endpoint (KUBERNETES_SERVICE_HOST unset "
                "and --k8s-api-base not given)"
            )
        out: Dict[str, List[str]] = {}
        headers = (
            {"Authorization": f"Bearer {self.token}"} if self.token else {}
        )
        for role, sel in self.selectors.items():
            if not sel:
                out[role] = None  # role not managed by discovery
                continue
            url = (
                f"{self.api_base}/api/v1/namespaces/{self.namespace}/pods"
                f"?labelSelector={sel}"
            )
            async with session.get(
                url, headers=headers, ssl=self.ssl_ctx,
                timeout=aiohttp.ClientTimeout(total=10),
            ) as r:
                r.raise_for_status()
                pods = (await r.json()).get("items", [])
            urls = []
            for pod in pods:
                status = pod.get("status", {})
                ip = status.get("podIP")
                ready = any(
                    c.get("type") == "Ready" and c.get("status") == "True"
                    for c in status.get("conditions", [])
                )
                if ip and ready:
                    # per-pod port override via annotation
                    ann = pod.get("metadata", {}).get("annotations", {})
                    port = int(ann.get("sglang.ai/port", self.port))
                    urls.append(f"http://{ip}:{port}")
            out[role] = sorted(urls)
        return out


class FileSource:
    def __init__(self, path: str):
        self.path = path

    async def fetch(self, session) -> Dict[str, List[str]]:
        with open(self.path) as f:
            data = json.load(f)
        return {
            "workers": data.get("workers"),
            "prefill": data.get("prefill"),
            "decode": data.get("decode"),
        }


class ServiceDiscovery:
    """Reconciliation loop: diff desired vs actual pools, add/remove."""

    def __init__(self, router, source, interval: float = 10.0):
        self.router = router
        self.source = source
        self.interval = interval
        self._task = None

    def reconcile(self, desired: Dict[str, Optional[List[str]]]):
        r = self.router
        pools = {
            "workers": r.workers,
            "prefill": r.pd_prefill,
            "decode": r.pd_decode,
        }
        for role, want in desired.items():
            if want is None:
                continue
            want = [w.rstrip("/") for w in want]
            pool = pools[role]
            for url in want:
                if url not in pool:
                    pool.append(url)
                    r.inflight.setdefault(url, 0)
                    r.total.setdefault(url, 0)
                    logger.info("discovery: +%s (%s)", url, role)
            for url in [w for w in pool if w not in want]:
                pool.remove(url)
                r.quarantined.discard(url)
                if hasattr(r.tree, "remove_worker"):
                    r.tree.remove_worker(url)
                logger.info("discovery: -%s (%s)", url, role)

    async def loop(self):
        while True:
            try:
                desired = await self.source.fetch(self.router.session)
                self.reconcile(desired)
            except Exception as e:
                logger.warning("service discovery fetch failed: %s", e)
            await asyncio.sleep(self.interval)

    def start(self):
        self._task = asyncio.create_task(self.loop())

    def stop(self):
        if self._task:
            self._task.cancel()
