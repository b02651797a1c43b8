"""Hierarchical radix cache: device HBM <-> host DRAM <-> storage KV tiers.

Counterpart of the reference's `mem_cache/hiradix_cache.py`
(`HiRadixCache:26`) + `managers/cache_controller.py` + host pools
(`memory_pool_host.py`) + `mem_cache/hicache_storage.py`.

Round-2 design — fully asynchronous:

* **Write-through** (default): newly inserted prefixes are backed up to the
  host tier in the background the moment they enter the tree, so eviction
  is free (gather already dispatched; pages can be dropped instantly).
  `--hicache-write-policy write_back` defers the backup to evict time —
  still non-blocking, because the on-device gather is dispatched before the
  pages are freed and only the host fetch runs in the background.
* **Eviction never blocks the scheduler thread.**
* **Restores are asynchronous**: a prefix match that lands on a tombstone
  kicks off a background host->device load and reports the pending token
  count via ``MatchResult.loading``; the scheduler defers that request's
  admission (instead of the reference's per-layer LayerDoneCounter overlap)
  and admits it with the full prefix once the load commits.
* **Storage tier** (`--hicache-storage-backend file`): host-budget overflow
  spills page-hashed KV to external storage instead of dropping it, and
  prefix matches probe storage for pages beyond the tree — prefix reuse
  survives server restarts.

Tree mutations happen only on the scheduler thread; background threads do
pure transfers.  Completed jobs are attached by *token path* (not node
pointers), so splits/evictions while a job is in flight are harmless.
"""

from __future__ import annotations

import heapq
import logging
import time
from typing import List, Optional

import numpy as np

from sglang_npu_tpu.mem_cache.allocator import PagedAllocator
from sglang_npu_tpu.mem_cache.cache_controller import (
    DONE,
    BackupJob,
    CacheController,
    FetchJob,
    LoadJob,
    ProbeJob,
    StoreJob,
)
from sglang_npu_tpu.mem_cache.hicache_storage import hash_chain
from sglang_npu_tpu.mem_cache.radix_cache import MatchResult, RadixCache, TreeNode

logger = logging.getLogger(__name__)


class HiRadixCache(RadixCache):
    def __init__(
        self,
        allocator: PagedAllocator,
        page_size: int,
        kv_io,  # ModelRunner KV IO surface (gather/scatter dispatch halves)
        host_bytes_budget: int = 4 << 30,
        write_policy: str = "write_through",
        storage=None,
    ):
        assert write_policy in ("write_through", "write_back")
        self.kv_io = kv_io
        self.host_bytes_budget = host_bytes_budget
        self.host_bytes = 0
        self.write_policy = write_policy
        self.storage = storage
        self.controller = CacheController(kv_io, storage)
        self._epoch = 0
        self._pending = 0
        self._probed: dict = {}  # first-missing page hash -> time
        super().__init__(allocator, page_size)

    def reset(self):
        super().reset()
        self.host_bytes = 0
        self._epoch += 1
        self._pending = 0
        self._probed = {}

    def shutdown(self):
        # Flush in-flight write-through/spill work so the storage tier is
        # durable across a clean shutdown (bounded: transfers already run).
        deadline = time.time() + 10.0
        while self._pending and time.time() < deadline:
            self.poll()
            time.sleep(0.005)
        self.controller.shutdown()

    def pending_jobs(self) -> int:
        return self._pending

    # ------------------------------------------------------------------
    # Node helpers (extra per-node state lives as plain attributes)
    # ------------------------------------------------------------------
    @staticmethod
    def _hd(node) -> Optional[np.ndarray]:
        return getattr(node, "host_data", None)

    def _path_tokens(self, node: TreeNode) -> List[int]:
        """Token ids from the root down to (and including) ``node``."""
        parts = []
        while node is not None and not node.is_root:
            parts.append(node.key)
            node = node.parent
        out: List[int] = []
        for k in reversed(parts):
            out.extend(k)
        return out

    def _node_namespace(self, node: TreeNode) -> int:
        while node.parent is not None:
            node = node.parent
        for ns, root in self.roots.items():
            if root is node:
                return ns
        return 0

    def _page_hashes(self, path_tokens: List[int], start: int) -> List[str]:
        """Storage keys for the pages of ``path_tokens[start:]``."""
        chain = hash_chain(path_tokens, self.page_size)
        return chain[start // self.page_size :]

    # ------------------------------------------------------------------
    # Split: tombstone- and host-tier-aware
    # ------------------------------------------------------------------
    def _split_node(self, child: TreeNode, split_len: int) -> TreeNode:
        new_node = TreeNode()
        new_node.key = child.key[:split_len]
        new_node.value = (
            child.value[:split_len] if child.value is not None else None
        )
        new_node.parent = child.parent
        new_node.lock_ref = child.lock_ref
        new_node.children = {self._child_key(child.key[split_len:]): child}
        new_node.parent.children[self._child_key(new_node.key)] = new_node

        host = self._hd(child)
        if host is not None:
            new_node.host_data = host[:, :, :, :split_len]
            child.host_data = host[:, :, :, split_len:]
            new_node.host_time = getattr(child, "host_time", 0.0)
        keys = getattr(child, "storage_keys", None)
        if keys is not None:
            cut = split_len // self.page_size
            new_node.storage_keys = keys[:cut]
            child.storage_keys = keys[cut:]
        for flag in ("backup_inflight", "loading"):
            if getattr(child, flag, False):
                setattr(new_node, flag, True)

        child.key = child.key[split_len:]
        child.value = (
            child.value[split_len:] if child.value is not None else None
        )
        child.parent = new_node
        return new_node

    # ------------------------------------------------------------------
    # Insert: adopt tombstones along the path (their content is identical
    # by construction — keys are the token ids), then write through.
    # ------------------------------------------------------------------
    def insert(self, key, value, namespace: int = 0) -> int:
        assert len(key) == len(value)
        assert len(key) % self.page_size == 0
        node = self._get_root(namespace)
        node.last_access_time = TreeNode.tick()
        total_prefix = 0
        adopted = False
        pos = 0
        key = list(key)
        value = np.asarray(value, dtype=np.int32)
        while pos < len(key):
            child = node.children.get(self._child_key(key[pos:]))
            if child is None:
                new_node = TreeNode()
                new_node.parent = node
                new_node.key = key[pos:]
                new_node.value = value[pos:]
                node.children[self._child_key(key[pos:])] = new_node
                self.evictable_size_ += len(key) - pos
                break
            child.last_access_time = TreeNode.tick()
            # the child was found via its first page, so match_len >= page_size
            match_len = self._key_match(child.key, key[pos:])
            if match_len < len(child.key):
                child = self._split_node(child, match_len)
            if child.value is None:
                # tombstone adoption: take ownership of the caller's slots
                child.value = value[pos : pos + match_len]
                child.loading = False
                self.evictable_size_ += match_len
                adopted = True
            elif not adopted:
                total_prefix += match_len
            else:
                # resident node below an adopted tombstone (shouldn't occur
                # by invariant; free the duplicate slots defensively)
                self.allocator.free_slots(value[pos : pos + match_len])
            node = child
            pos += match_len
        if self.write_policy == "write_through":
            self._write_through(key, namespace)
        return total_prefix

    def _write_through(self, key: List[int], namespace: int) -> None:
        """Submit background host backups for un-backed-up resident nodes
        on the path of ``key``."""
        node = self._get_root(namespace)
        pos = 0
        while pos < len(key):
            child = node.children.get(self._child_key(key[pos:]))
            if child is None:
                return
            match_len = self._key_match(child.key, key[pos:])
            if match_len < len(child.key):
                return
            if (
                child.value is not None
                and self._hd(child) is None
                and not getattr(child, "backup_inflight", False)
                and getattr(child, "storage_keys", None) is None
            ):
                self._submit_backup(child, key[: pos + match_len], pos)
            node = child
            pos += match_len

    def _submit_backup(self, node: TreeNode, path_tokens: List[int], start: int):
        node.backup_inflight = True
        tag = (self._epoch, self._node_namespace(node), list(path_tokens), start)
        self.controller.submit_backup(tag, node.value)
        self._pending += 1

    # ------------------------------------------------------------------
    # Eviction: non-blocking — dispatch backup (if needed) + tombstone
    # ------------------------------------------------------------------
    def _device_leaves(self) -> List[TreeNode]:
        """Deepest device-resident frontier (children all tombstone/absent)."""
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
            if (
                self._hd(node) is None
                and not getattr(node, "backup_inflight", False)
                and getattr(node, "storage_keys", None) is None
            ):
                # write_back (or a race): dispatch the gather now — pages
                # can still be freed immediately (computed at dispatch
                # order); only the host fetch trails in the background
                path = self._path_tokens(node)
                self._submit_backup(node, path, len(path) - len(node.key))
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

    # ------------------------------------------------------------------
    # Match: kick off async restores; report pending tokens
    # ------------------------------------------------------------------
    def match_prefix(self, key, namespace: int = 0) -> MatchResult:
        ps = self.page_size
        key = list(key[: len(key) // ps * ps])
        node = self._get_root(namespace)
        node.last_access_time = TreeNode.tick()
        values: List[np.ndarray] = []
        loading = 0
        pos = 0
        while pos < len(key):
            child = node.children.get(self._child_key(key[pos:]))
            if child is None:
                break
            match_len = self._key_match(child.key, key[pos:])
            if match_len == 0:
                break
            child.last_access_time = TreeNode.tick()
            if child.value is None:
                if match_len < len(child.key):
                    # restore only the matched span (split slices host_data
                    # and storage keys, so the tag covers the whole node)
                    child = self._split_node(child, match_len)
                loading = self._request_restore(child, key[: pos + match_len], pos)
                break
            if match_len < len(child.key):
                child = self._split_node(child, match_len)
                values.append(child.value)
                node = child
                pos += match_len
                break
            values.append(child.value)
            node = child
            pos += match_len
        if (
            loading == 0
            and self.storage is not None
            and pos + ps <= len(key)
        ):
            loading = self._maybe_probe_storage(key, pos, namespace)
        slots = (
            np.concatenate(values).astype(np.int32)
            if values
            else np.empty((0,), dtype=np.int32)
        )
        return MatchResult(slots, node, loading=loading)

    def _request_restore(
        self, child: TreeNode, path_tokens: List[int], start: int
    ) -> int:
        """Start restoring a tombstone; returns pending token count (0 if
        unrestorable)."""
        n = len(child.key)
        if getattr(child, "loading", False) or getattr(
            child, "backup_inflight", False
        ):
            return n
        host = self._hd(child)
        if host is not None:
            need_pages = -(-n // self.page_size)
            if self.allocator.available_pages() < need_pages:
                # pin the resident ancestors just matched (the caller holds
                # their slots in `values` but no lock yet) so making room
                # for the restore can't free them
                self.inc_lock_ref(child.parent)
                try:
                    self.evict(need_pages * self.page_size)
                finally:
                    self.dec_lock_ref(child.parent)
            pages: List[int] = []
            slots = self.allocator.alloc_extend(0, n, pages)
            if slots is None:
                return 0  # no device room: proceed without this prefix
            child.loading = True
            self.host_bytes -= host.nbytes
            child.host_data = None
            tag = (self._epoch, self._node_namespace(child), list(path_tokens), start)
            self.controller.submit_load(tag, slots, host)
            self._pending += 1
            return n
        keys = getattr(child, "storage_keys", None)
        if keys:
            child.loading = True
            tag = (self._epoch, self._node_namespace(child), list(path_tokens), start)
            self.controller.submit_fetch(tag, keys)
            self._pending += 1
            return n
        # unrestorable: prune the dead subtree
        self._drop_subtree(child)
        if child.parent is not None:
            child.parent.children.pop(self._child_key(child.key), None)
        return 0

    def _drop_subtree(self, node: TreeNode) -> None:
        stack = [node]
        while stack:
            n = stack.pop()
            stack.extend(n.children.values())
            if n.value is not None:
                self.allocator.free_slots(n.value)
                self.evictable_size_ -= len(n.value)
            host = self._hd(n)
            if host is not None:
                self.host_bytes -= host.nbytes
                n.host_data = None

    def _maybe_probe_storage(self, key: List[int], pos: int, namespace: int) -> int:
        """Probe the storage tier for pages beyond the tree (content-
        addressed, so this works across restarts).  Returns the pending
        token count so the scheduler defers admission until the probe lands
        (the reference's storage prefetch-and-wait,
        `cache_controller.py` prefetch threads); a recent negative probe is
        remembered so cold prompts pay at most one deferral round."""
        chain = hash_chain(key, self.page_size)
        first_missing = chain[pos // self.page_size]
        now = time.time()
        t = self._probed.get(first_missing)
        if t == "inflight":
            return len(key) - pos
        if t is not None and now - t < 30.0:
            return 0
        self._probed[first_missing] = "inflight"
        if len(self._probed) > 4096:
            self._probed = {
                k: v
                for k, v in self._probed.items()
                if v == "inflight" or now - v < 30.0
            }
        tag = (self._epoch, namespace, list(key), pos)
        self.controller.submit_probe(tag, chain[pos // self.page_size :])
        self._pending += 1
        return len(key) - pos

    # ------------------------------------------------------------------
    # Poll: attach completed background work (scheduler thread)
    # ------------------------------------------------------------------
    def poll(self) -> None:
        jobs = self.controller.drain_done()
        for job in jobs:
            if isinstance(job, StoreJob):
                self._pending = max(0, self._pending - 1)
                continue  # fire-and-forget spill
            epoch, ns, tokens, start = job.tag
            if epoch != self._epoch:
                continue  # pre-reset job: tree and allocator were cleared
            self._pending = max(0, self._pending - 1)
            if isinstance(job, BackupJob):
                self._attach_backup(job, ns, tokens, start)
            elif isinstance(job, LoadJob):
                self._attach_load(job, ns, tokens, start)
            elif isinstance(job, FetchJob):
                self._attach_fetch(job, ns, tokens, start)
            elif isinstance(job, ProbeJob):
                self._attach_probe(job, ns, tokens, start)

    def _walk_covered(self, ns: int, tokens: List[int], start: int):
        """Yield (node, s, e) for tree nodes whose keys lie fully inside
        ``tokens[start:]`` (offsets relative to ``start``), splitting so
        boundary nodes align.  Robust to any tree changes since submit."""
        node = self._get_root(ns)
        pos = 0
        while pos < len(tokens):
            child = node.children.get(self._child_key(tokens[pos:]))
            if child is None:
                return
            match_len = self._key_match(child.key, tokens[pos:])
            if match_len == 0:
                return
            if pos < start < pos + match_len:
                # straddles the span start: split so coverage is whole-node
                child = self._split_node(child, start - pos)
                match_len = start - pos
            elif match_len < len(child.key):
                child = self._split_node(child, match_len)
            end = pos + len(child.key)
            if pos >= start:
                yield child, pos - start, end - start
            node = child
            pos = end

    def _attach_backup(self, job: BackupJob, ns, tokens, start):
        rows = job.result
        for node, s, e in self._walk_covered(ns, tokens, start):
            node.backup_inflight = False
            if job.state != DONE:
                continue
            if (
                self._hd(node) is None
                and getattr(node, "storage_keys", None) is None
            ):
                node.host_data = rows[:, :, :, s:e]
                node.host_time = time.time()
                self.host_bytes += node.host_data.nbytes
        if job.state == DONE:
            self._enforce_host_budget()

    def _attach_load(self, job: LoadJob, ns, tokens, start):
        slots = job.slots
        if job.state != DONE:
            for node, s, e in self._walk_covered(ns, tokens, start):
                node.loading = False
            self.allocator.free_slots(slots)
            return
        # commit the uploaded rows into the pool (cheap, scheduler thread)
        self.kv_io.scatter_kv_commit(slots, job.handle)
        covered = 0
        for node, s, e in self._walk_covered(ns, tokens, start):
            node.loading = False
            if node.value is None:
                node.value = slots[s:e]
                self.evictable_size_ += e - s
                node.last_access_time = TreeNode.tick()
            else:
                self.allocator.free_slots(slots[s:e])  # recomputed meanwhile
            covered = max(covered, e)
        if covered < len(slots):
            self.allocator.free_slots(slots[covered:])

    def _attach_fetch(self, job: FetchJob, ns, tokens, start):
        """A storage fetch is always the middle leg of a device restore:
        forward the rows straight into a host->device load (parking them in
        the host tier would let a tight budget spill them right back —
        fetch/spill livelock)."""
        for node, s, e in self._walk_covered(ns, tokens, start):
            if job.state != DONE:
                node.loading = False
                node.storage_keys = None  # storage hole: unrestorable
                continue
            if node.value is not None:
                node.loading = False
                continue  # recomputed meanwhile
            n = e - s
            need_pages = -(-n // self.page_size)
            if self.allocator.available_pages() < need_pages:
                self.inc_lock_ref(node.parent)
                try:
                    self.evict(need_pages * self.page_size)
                finally:
                    self.dec_lock_ref(node.parent)
            slots = self.allocator.alloc_extend(0, n, [])
            if slots is None:
                # no device room: park in the host tier as a fallback
                node.loading = False
                if self._hd(node) is None:
                    node.host_data = job.result[:, :, :, s:e]
                    node.host_time = time.time()
                    self.host_bytes += node.host_data.nbytes
                continue
            node.loading = True
            tag = (self._epoch, ns, list(tokens[: start + e]), start + s)
            self.controller.submit_load(
                tag, slots, job.result[:, :, :, s:e]
            )
            self._pending += 1

    def _attach_probe(self, job: ProbeJob, ns, tokens, start):
        # record completion (negative or not) so match stops deferring
        if job.keys:
            self._probed[job.keys[0]] = time.time()
        if job.state != DONE or not job.result:
            return
        rows = np.concatenate(job.result, axis=3)
        covered_tokens = tokens[: start + rows.shape[3]]
        # walk to the deepest existing node on the path; hang a tombstone
        node = self._get_root(ns)
        pos = 0
        while pos < len(covered_tokens):
            child = node.children.get(self._child_key(covered_tokens[pos:]))
            if child is None:
                break
            match_len = self._key_match(child.key, covered_tokens[pos:])
            if match_len == 0:
                return  # diverged: token path no longer in tree shape
            if match_len < len(child.key):
                return  # partially covered resident node: skip (rare)
            node = child
            pos += match_len
        if pos < start or pos >= len(covered_tokens):
            return
        new_node = TreeNode()
        new_node.parent = node
        new_node.key = covered_tokens[pos:]
        new_node.value = None
        new_node.host_data = rows[:, :, :, pos - start :]
        new_node.host_time = time.time()
        # the probed pages live in storage too: record their keys so the
        # node stays restorable even if the host copy is spilled/dropped
        new_node.storage_keys = hash_chain(covered_tokens, self.page_size)[
            pos // self.page_size :
        ]
        node.children[self._child_key(new_node.key)] = new_node
        self.host_bytes += new_node.host_data.nbytes
        self._enforce_host_budget()

    # ------------------------------------------------------------------
    # Host budget: spill LRU host data to storage (or drop)
    # ------------------------------------------------------------------
    def _enforce_host_budget(self) -> None:
        if self.host_bytes <= self.host_bytes_budget:
            return
        entries = []
        stack = list(self.roots.values())
        while stack:
            n = stack.pop()
            stack.extend(n.children.values())
            if self._hd(n) is not None:
                entries.append(n)
        entries.sort(key=lambda n: getattr(n, "host_time", 0.0))
        for n in entries:
            if self.host_bytes <= self.host_bytes_budget:
                return
            host = n.host_data
            self.host_bytes -= host.nbytes
            n.host_data = None
            if self.storage is not None:
                path = self._path_tokens(n)
                keys = self._page_hashes(path, len(path) - len(n.key))
                pages = [
                    host[:, :, :, i : i + self.page_size]
                    for i in range(0, host.shape[3], self.page_size)
                ]
                n.storage_keys = keys
                self.controller.submit_store(keys, pages)
                self._pending += 1
            elif n.value is None and getattr(n, "storage_keys", None) is None:
                # dropped tombstone: now unrestorable; prune lazily on match
                pass
