"""KV cache event publishing.

Counterpart of the reference's `srt/mem_cache/radix_cache.py` kv_events
integration + `srt/managers/scheduler` event batches (vllm-style
`KVEventBatch` with BlockStored/BlockRemoved/AllBlocksCleared): external
routers subscribe to per-worker KV cache content changes so cluster-level
cache-aware routing can track EXACT prefix residency instead of the
approximate recency tree.

Pages are content-addressed: ``hash_i = sha256(hash_{i-1} || tokens_i)``
(the same chain HiCache's storage tier uses), so a router can match a
request's prompt pages against worker block hashes directly.

Transport: an in-process ring buffer with monotonic sequence numbers,
drained via ``take(since)`` (exposed at ``GET /kv_events?since=N``), plus
an optional ZMQ PUB socket (``--kv-events-endpoint tcp://...``) matching
the reference's publisher topology.
"""

from __future__ import annotations

import collections
import hashlib
import json
import logging
import threading
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def chain_hashes(parent_hash: str, key, page_size: int) -> List[str]:
    """Content hashes of each page of ``key`` chained from parent_hash."""
    out = []
    h = parent_hash
    for i in range(0, len(key), page_size):
        page = key[i:i + page_size]
        m = hashlib.sha256()
        m.update(h.encode())
        m.update(np.asarray(page, dtype=np.int64).tobytes())
        h = m.hexdigest()[:32]
        out.append(h)
    return out


class KvEventPublisher:
    def __init__(self, zmq_endpoint: Optional[str] = None, cap: int = 8192):
        self.seq = 0
        self.buf = collections.deque(maxlen=cap)
        self._lock = threading.Lock()
        self._sock = None
        if zmq_endpoint:
            import zmq

            ctx = zmq.Context.instance()
            self._sock = ctx.socket(zmq.PUB)
            self._sock.bind(zmq_endpoint)
            logger.info("kv_events publishing on %s", zmq_endpoint)

    def _emit(self, ev: dict):
        with self._lock:
            self.seq += 1
            ev["seq"] = self.seq
            self.buf.append(ev)
            sock = self._sock
        if sock is not None:
            try:
                sock.send_multipart(
                    [b"kv-events", json.dumps(ev).encode()], flags=1  # NOBLOCK
                )
            except Exception:
                pass  # no subscriber / HWM: events remain in the ring

    def block_stored(self, hashes: List[str], parent_hash: str,
                     num_tokens: int):
        self._emit({
            "type": "block_stored",
            "block_hashes": hashes,
            "parent_block_hash": parent_hash,
            "num_tokens": num_tokens,
        })

    def block_removed(self, hashes: List[str]):
        self._emit({"type": "block_removed", "block_hashes": hashes})

    def all_cleared(self):
        self._emit({"type": "all_blocks_cleared"})

    def take(self, since: int = 0) -> List[dict]:
        with self._lock:
            return [e for e in self.buf if e["seq"] > since]


ROOT_HASH = "root"


def node_last_hash(node, page_size: int) -> str:
    """Last page hash of a tree node (cached on the node; computed lazily
    by walking up so enabling events mid-flight still works)."""
    if getattr(node, "is_root", False):
        return ROOT_HASH
    hashes = getattr(node, "kv_hashes", None)
    if hashes is None:
        parent = node_last_hash(node.parent, page_size)
        hashes = chain_hashes(parent, node.key, page_size)
        node.kv_hashes = hashes
    return hashes[-1] if hashes else node_last_hash(node.parent, page_size)
