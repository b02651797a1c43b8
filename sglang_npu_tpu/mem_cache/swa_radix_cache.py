"""Radix cache for sliding-window (hybrid-pool) models.

TPU re-design of the reference's `srt/mem_cache/swa_radix_cache.py`
(1,025 LoC tombstone tree).  The reference keeps every token's SWA KV and
tombstones out-of-window nodes lazily under memory pressure; prefix
matches are valid only when the last `window` tokens of the match are
non-tombstoned.

Here the window pool is a per-request page **ring** (`ops/hybrid_kv.py`),
so a finished request's window KV is exactly its last-window page ring.
The tree therefore caches, per terminal node, a **window snapshot**: the
ring pages covering the final `window` tokens of the cached sequence.

Match semantics (the TPU analogue of the reference's window-completeness
rule): a prefix match is usable iff it ends *exactly* at a node holding a
snapshot of that length — i.e. the match must cover a whole previously
cached sequence (the dominant multi-turn continuation pattern).  Shorter
forks fall back to a full recompute, which the reference would sometimes
serve via non-tombstoned interior nodes; in exchange, live requests here
never hold more than `window + page` tokens of SWA KV, a bound the
reference only approaches under eviction pressure.

On reuse the snapshot is **copied** into the new request's own ring
(copy-on-extend) so concurrent requests sharing a prefix can never
overwrite each other's window pages.  Window-pool pressure is relieved by
``evict_swa`` — dropping snapshots from least-recently-used unlocked
nodes (the tombstone analogue: full-attention KV stays cached, only the
window reuse is lost).
"""

from __future__ import annotations

import heapq
from typing import Callable, List, Optional, Sequence

import numpy as np

from sglang_npu_tpu.mem_cache.allocator import PagedAllocator
from sglang_npu_tpu.mem_cache.radix_cache import MatchResult, RadixCache, TreeNode


class SWARadixCache(RadixCache):
    is_swa = True

    def __init__(
        self,
        allocator: PagedAllocator,
        page_size: int,
        swa_allocator: PagedAllocator,
        ring_pages: int,
        copy_swa_pages: Callable[[Sequence[int], Sequence[int]], None],
    ):
        self.swa_allocator = swa_allocator
        self.ring_pages = ring_pages
        self.copy_swa_pages = copy_swa_pages
        self.swa_evictable_pages_ = 0
        super().__init__(allocator, page_size)

    def reset(self):
        # drop all snapshots back to the window allocator
        if getattr(self, "roots", None):
            for node in self._all_nodes():
                snap = getattr(node, "swa_snapshot", None)
                if snap is not None:
                    self.swa_allocator.free_page_ids(snap[0])
                    node.swa_snapshot = None
        self.swa_evictable_pages_ = 0
        super().reset()

    def _all_nodes(self) -> List[TreeNode]:
        out, stack = [], list(self.roots.values())
        while stack:
            n = stack.pop()
            out.append(n)
            stack.extend(n.children.values())
        return out

    # ------------------------------------------------------------------
    def match_prefix(
        self, key: List[int], namespace: int = 0, ring_ok: bool = False
    ) -> MatchResult:
        """Longest usable prefix.  ``ring_ok`` is set by a request that
        already owns a valid ring for the matched region (chunked-prefill
        continuation) — then no snapshot is required."""
        res = super().match_prefix(key, namespace=namespace)
        if ring_ok or len(res.device_indices) == 0:
            return res
        node = res.last_node
        snap = getattr(node, "swa_snapshot", None)
        if snap is not None and snap[1] == len(res.device_indices):
            res.swa_snapshot_node = node
            return res
        # no window KV for this prefix -> unusable, report a miss
        return MatchResult(
            np.empty((0,), dtype=np.int32), self._get_root(namespace)
        )

    # ------------------------------------------------------------------
    def cache_finished_req(self, req) -> None:
        """Insert full-pool pages as usual, then adopt the request's ring
        as the terminal node's window snapshot."""
        ps = self.page_size
        aligned = len(req.kv_slots) // ps * ps
        token_ids = (req.cache_key_seq() if hasattr(req, 'cache_key_seq') else req.fill_ids)[: len(req.kv_slots)]
        ns = getattr(req, "lora_id", 0) or 0
        super().cache_finished_req(req)
        ring = getattr(req, "swa_pages", None)
        if not ring:
            return
        if aligned == 0:
            self.swa_allocator.free_page_ids(ring)
            req.swa_pages = []
            return
        res = RadixCache.match_prefix(self, token_ids[:aligned], namespace=ns)
        node = res.last_node
        if (
            len(res.device_indices) != aligned
            or node.is_root
            or getattr(node, "swa_snapshot", None) is not None
        ):
            # can't attach (concurrent eviction) or an identical snapshot
            # already exists -> this ring is redundant
            self.swa_allocator.free_page_ids(ring)
        else:
            node.swa_snapshot = (list(ring), aligned)
            if node.lock_ref == 0:
                self.swa_evictable_pages_ += len(ring)
        req.swa_pages = []

    # ------------------------------------------------------------------
    def restore_ring(self, req) -> None:
        """Copy the matched node's window snapshot into a fresh ring owned
        by ``req`` (copy-on-extend).  Caller must hold the prefix lock."""
        node = getattr(req, "swa_snapshot_src", None)
        req.swa_snapshot_src = None
        if node is None:
            return
        snap = getattr(node, "swa_snapshot", None)
        if snap is None or snap[1] != req.prefix_len:
            # evicted between match and admission: drop the prefix and
            # recompute (caller re-checks prefix_len)
            req.prefix_len = 0
            req.kv_slots = np.empty((0,), dtype=np.int32)
            req.extend_input_len = len(req.fill_ids)
            return
        src, _ = snap
        dst = self.swa_allocator.alloc_pages(len(src))
        if dst is None:
            self.evict_swa(len(src) * self.page_size, protect=set(src))
            dst = self.swa_allocator.alloc_pages(len(src))
        if dst is None:
            req.prefix_len = 0
            req.kv_slots = np.empty((0,), dtype=np.int32)
            req.extend_input_len = len(req.fill_ids)
            return
        self.copy_swa_pages(src, dst)
        req.swa_pages = list(dst)

    # ------------------------------------------------------------------
    def evict_swa(self, num_tokens: int, protect: Optional[set] = None) -> None:
        """Free window snapshots from LRU unlocked nodes (the tombstone
        analogue: full KV stays, window reuse for that prefix is lost)."""
        nodes = [
            n
            for n in self._all_nodes()
            if getattr(n, "swa_snapshot", None) is not None
            and n.lock_ref == 0
            and not (protect and protect.intersection(n.swa_snapshot[0]))
        ]
        heapq.heapify(nodes)
        freed = 0
        while freed < num_tokens and nodes:
            node = heapq.heappop(nodes)
            pages, _ = node.swa_snapshot
            node.swa_snapshot = None
            self.swa_allocator.free_page_ids(pages)
            self.swa_evictable_pages_ -= len(pages)
            freed += len(pages) * self.page_size

    def evictable_swa_size(self) -> int:
        return self.swa_evictable_pages_ * self.page_size

    # ------------------------------------------------------------------
    def evict(self, num_tokens: int) -> None:
        # full eviction drops the node entirely -> release its snapshot too
        before = {
            id(n): n
            for n in self._all_nodes()
            if getattr(n, "swa_snapshot", None) is not None
        }
        super().evict(num_tokens)
        alive = {id(n) for n in self._all_nodes()}
        for nid, node in before.items():
            if nid not in alive:
                pages, _ = node.swa_snapshot
                node.swa_snapshot = None
                self.swa_allocator.free_page_ids(pages)
                if node.lock_ref == 0:
                    self.swa_evictable_pages_ -= len(pages)

    # ------------------------------------------------------------------
    def inc_lock_ref(self, node: TreeNode) -> None:
        n = node
        while n is not None and not n.is_root:
            snap = getattr(n, "swa_snapshot", None)
            if snap is not None and n.lock_ref == 0:
                self.swa_evictable_pages_ -= len(snap[0])
            n = n.parent
        super().inc_lock_ref(node)

    def dec_lock_ref(self, node: TreeNode) -> None:
        n = node
        while n is not None and not n.is_root:
            snap = getattr(n, "swa_snapshot", None)
            if snap is not None and n.lock_ref == 1:
                self.swa_evictable_pages_ += len(snap[0])
            n = n.parent
        super().dec_lock_ref(node)
