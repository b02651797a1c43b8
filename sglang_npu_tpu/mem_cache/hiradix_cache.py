"""Hierarchical radix cache: device HBM <-> host DRAM KV tiers.

Counterpart of the reference's `mem_cache/hiradix_cache.py`
(`HiRadixCache:26`) + `managers/cache_controller.py` + host pools
(`memory_pool_host.py`): when device KV must be evicted, the pages are
backed up to a host pool and the tree node becomes a *tombstone* that can be
restored on a future prefix match — prefix reuse survives HBM pressure.

Round-1 scope: synchronous write-back on evict and restore on match (the
reference's async write-through threads and layer-by-layer H2D overlap are
the round-2 upgrade).  Device transfers go through two jitted hooks on the
ModelRunner (`gather_kv`, `scatter_kv`).
"""

from __future__ import annotations

import heapq
import logging
import time
from typing import List, Optional

import numpy as np

from sglang_npu_tpu.mem_cache.allocator import PagedAllocator
from sglang_npu_tpu.mem_cache.radix_cache import MatchResult, RadixCache, TreeNode

logger = logging.getLogger(__name__)


class HiRadixCache(RadixCache):
    def __init__(
        self,
        allocator: PagedAllocator,
        page_size: int,
        kv_io,  # object with gather_kv(slots)->np and scatter_kv(slots, np)
        host_bytes_budget: int = 4 << 30,
    ):
        self.kv_io = kv_io
        self.host_bytes_budget = host_bytes_budget
        self.host_bytes = 0
        super().__init__(allocator, page_size)

    def reset(self):
        super().reset()
        self.host_bytes = 0

    # ------------------------------------------------------------------
    # Eviction: back up to host + tombstone instead of dropping
    # ------------------------------------------------------------------
    def _device_leaves(self) -> List[TreeNode]:
        """Nodes whose KV is device-resident and all of whose children are
        tombstones/absent (the deepest device-resident frontier)."""
        out, stack = [], list(self.roots.values())
        while stack:
            n = stack.pop()
            resident_children = [
                c for c in n.children.values() if c.value is not None
            ]
            stack.extend(resident_children)
            if n.value is not None and not resident_children and not n.is_root:
                out.append(n)
        return out

    def evict(self, num_tokens: int) -> None:
        leaves = [n for n in self._device_leaves() if n.lock_ref == 0]
        heapq.heapify(leaves)
        evicted = 0
        while evicted < num_tokens and leaves:
            node = heapq.heappop(leaves)
            self._backup_to_host(node)
            self.allocator.free_slots(node.value)
            evicted += len(node.value)
            self.evictable_size_ -= len(node.value)
            node.value = None
            parent = node.parent
            if (
                parent is not None
                and not parent.is_root
                and parent.lock_ref == 0
                and parent.value is not None
                and all(c.value is None for c in parent.children.values())
            ):
                heapq.heappush(leaves, parent)

    def _backup_to_host(self, node: TreeNode) -> None:
        nbytes_est = len(node.value) * self._bytes_per_token()
        self._host_make_room(nbytes_est)
        if self.host_bytes + nbytes_est > self.host_bytes_budget:
            node.host_data = None  # unrestorable: dropped
            return
        try:
            node.host_data = self.kv_io.gather_kv(node.value)
            node.host_time = time.time()
            self.host_bytes += node.host_data.nbytes
        except Exception:
            logger.exception("host backup failed; dropping node")
            node.host_data = None

    def _bytes_per_token(self) -> int:
        return getattr(self.kv_io, "kv_bytes_per_token", 1024)

    def _host_make_room(self, need: int) -> None:
        if self.host_bytes + need <= self.host_bytes_budget:
            return
        entries = []
        stack = list(self.roots.values())
        while stack:
            n = stack.pop()
            stack.extend(n.children.values())
            if n.value is None and getattr(n, "host_data", None) is not None:
                entries.append(n)
        entries.sort(key=lambda n: getattr(n, "host_time", 0.0))
        for n in entries:
            if self.host_bytes + need <= self.host_bytes_budget:
                break
            self.host_bytes -= n.host_data.nbytes
            n.host_data = None  # becomes unrestorable tombstone

    # ------------------------------------------------------------------
    # Match: restore tombstones on the path back onto the device
    # ------------------------------------------------------------------
    def match_prefix(self, key, namespace: int = 0) -> MatchResult:
        self._restore_path(key, namespace)
        return super().match_prefix(key, namespace)

    def insert(self, key, value, namespace: int = 0) -> int:
        # the insertion path must hold no tombstones: restore what we can,
        # prune what we cannot (unrestorable subtrees never have locked
        # descendants — locks pin the whole ancestor chain device-resident)
        self._restore_path(key, namespace)
        self._prune_unrestorable(key, namespace)
        return super().insert(key, value, namespace)

    def _prune_unrestorable(self, key, namespace: int) -> None:
        key = list(key[: len(key) // self.page_size * self.page_size])
        node = self._get_root(namespace)
        while key:
            child = node.children.get(self._child_key(key))
            if child is None:
                return
            match_len = self._key_match(child.key, key)
            if match_len == 0:
                return
            if child.value is None:
                self._drop_subtree(child)
                del node.children[self._child_key(child.key)]
                return
            if match_len < len(child.key):
                return
            node = child
            key = key[match_len:]

    def _drop_subtree(self, node: TreeNode) -> None:
        stack = [node]
        while stack:
            n = stack.pop()
            stack.extend(n.children.values())
            if n.value is not None:
                self.allocator.free_slots(n.value)
                self.evictable_size_ -= len(n.value)
            host = getattr(n, "host_data", None)
            if host is not None:
                self.host_bytes -= host.nbytes
                n.host_data = None

    def _restore_path(self, key, namespace: int) -> None:
        key = list(key[: len(key) // self.page_size * self.page_size])
        node = self._get_root(namespace)
        while key:
            child = node.children.get(self._child_key(key))
            if child is None:
                return
            match_len = self._key_match(child.key, key)
            if match_len == 0:
                return
            if child.value is None:
                if not self._restore_node(child):
                    return
            if match_len < len(child.key):
                return
            node = child
            key = key[match_len:]

    def _restore_node(self, node: TreeNode) -> bool:
        host = getattr(node, "host_data", None)
        if host is None:
            return False
        n = len(node.key)
        need_pages = -(-n // self.page_size)
        if self.allocator.available_pages() < need_pages:
            # free device room from OTHER branches first
            self.evict(need_pages * self.page_size)
        pages: List[int] = []
        slots = self.allocator.alloc_extend(0, n, pages)
        if slots is None:
            return False
        try:
            self.kv_io.scatter_kv(slots, host)
        except Exception:
            logger.exception("host restore failed")
            self.allocator.free_slots(slots)
            return False
        node.value = slots
        self.evictable_size_ += n
        self.host_bytes -= host.nbytes
        node.host_data = None
        node.last_access_time = TreeNode.tick()
        return True
