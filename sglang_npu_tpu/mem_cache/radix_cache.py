"""RadixAttention prefix cache (host side).

Behavioral re-design of the reference's `srt/mem_cache/radix_cache.py`
(`TreeNode:43`, `RadixCache:123`, `match_prefix:163`, `insert:200`,
`cache_finished_req:208`, `cache_unfinished_req:245`, `evict:297`) for the
TPU engine's page-granular KV pool.

The tree maps token-id sequences to *device KV slot arrays*.  All tree-owned
keys have page-aligned length (multiple of ``page_size``); a request's
partial tail page never enters the tree (it is freed on finish), so page
ownership is always whole-page and the page free-list stays consistent.

This is pure host Python — device-agnostic by design; the device only ever
sees flat slot arrays / page tables derived from it.
"""

from __future__ import annotations

import heapq
from collections import defaultdict
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from sglang_npu_tpu.mem_cache.allocator import PagedAllocator


class TreeNode:
    counter = 0

    def __init__(self):
        self.children: Dict[Tuple[int, ...], "TreeNode"] = {}
        self.parent: Optional["TreeNode"] = None
        self.key: List[int] = []
        self.value: Optional[np.ndarray] = None  # KV slot ids, len == len(key)
        self.lock_ref = 0
        self.is_root = False
        self.last_access_time = TreeNode.tick()
        self.id = TreeNode.counter
        TreeNode.counter += 1

    _clock = 0

    @classmethod
    def tick(cls) -> int:
        cls._clock += 1
        return cls._clock

    @property
    def evicted(self) -> bool:
        return self.value is None

    def __lt__(self, other: "TreeNode"):
        return self.last_access_time < other.last_access_time


class MatchResult:
    __slots__ = ("device_indices", "last_node", "loading", "swa_snapshot_node")

    def __init__(
        self,
        device_indices: np.ndarray,
        last_node: TreeNode,
        loading: int = 0,
    ):
        self.device_indices = device_indices
        self.last_node = last_node
        # Tokens immediately after the matched prefix that a lower cache
        # tier is asynchronously restoring (HiRadixCache): the scheduler
        # defers admission until they land instead of recomputing them.
        self.loading = loading
        # SWARadixCache: node whose window snapshot backs this match.
        self.swa_snapshot_node: Optional[TreeNode] = None


class BasePrefixCache:
    """Interface shared by RadixCache and ChunkCache (reference
    `mem_cache/base_prefix_cache.py`)."""

    def reset(self):
        raise NotImplementedError

    def match_prefix(self, key: List[int]) -> MatchResult:
        raise NotImplementedError

    def cache_finished_req(self, req) -> None:
        raise NotImplementedError

    def cache_unfinished_req(self, req) -> None:
        raise NotImplementedError

    def evict(self, num_tokens: int) -> None:
        pass

    def inc_lock_ref(self, node) -> None:
        pass

    def dec_lock_ref(self, node) -> None:
        pass

    def evictable_size(self) -> int:
        return 0

    def protected_size(self) -> int:
        return 0

    # Sliding-window models (ops/hybrid_kv.py): window-pool reclamation.
    # Only SWARadixCache owns window pages; everything else no-ops.
    def evict_swa(self, num_tokens: int) -> None:
        pass

    def evictable_swa_size(self) -> int:
        return 0


class RadixCache(BasePrefixCache):
    # optional KvEventPublisher (mem_cache/kv_events.py): external routers
    # track exact per-worker prefix residency from stored/removed events
    events = None

    def __init__(self, allocator: PagedAllocator, page_size: int):
        self.allocator = allocator
        self.page_size = page_size
        self.reset()

    # ------------------------------------------------------------------
    def reset(self):
        if self.events is not None and getattr(self, "roots", None):
            self.events.all_cleared()
        # Namespaced roots: KV depends on the applied LoRA adapter, so each
        # adapter id gets its own prefix tree (reference: lora-aware radix
        # keys). Namespace 0 = no adapter.
        self.roots: Dict[int, TreeNode] = {}
        self.root_node = self._get_root(0)
        self.evictable_size_ = 0
        self.protected_size_ = 0

    def _get_root(self, namespace: int) -> TreeNode:
        root = self.roots.get(namespace)
        if root is None:
            root = TreeNode()
            root.value = np.empty((0,), dtype=np.int32)
            root.lock_ref = 1
            root.is_root = True
            self.roots[namespace] = root
        return root

    # ------------------------------------------------------------------
    def _child_key(self, key: List[int]) -> Tuple[int, ...]:
        return tuple(key[: self.page_size])

    def _key_match(self, k1: List[int], k2: List[int]) -> int:
        """Longest common page-aligned prefix length of two keys."""
        ps = self.page_size
        n = min(len(k1), len(k2))
        i = 0
        while i < n and k1[i] == k2[i]:
            i += 1
        return i // ps * ps

    # ------------------------------------------------------------------
    def match_prefix(self, key: List[int], namespace: int = 0) -> MatchResult:
        """Find the longest cached page-aligned prefix of ``key``.

        Returns tree-owned slot ids and the deepest matched node (to be
        lock-ref'd by the caller while the request is in flight).
        """
        key = key[: len(key) // self.page_size * self.page_size]
        node = self._get_root(namespace)
        node.last_access_time = TreeNode.tick()
        values = []
        while key:
            child = node.children.get(self._child_key(key))
            if child is None or child.value is None:
                # absent or tombstoned (HiRadixCache host tier) -> miss
                break
            child.last_access_time = TreeNode.tick()
            match_len = self._key_match(child.key, key)
            if match_len < len(child.key):
                if match_len == 0:
                    break
                child = self._split_node(child, match_len)
                values.append(child.value)
                node = child
                break
            values.append(child.value)
            node = child
            key = key[match_len:]
        slots = (
            np.concatenate(values).astype(np.int32)
            if values
            else np.empty((0,), dtype=np.int32)
        )
        return MatchResult(slots, node)

    # ------------------------------------------------------------------
    def _split_node(self, child: TreeNode, split_len: int) -> TreeNode:
        """Split ``child`` so its first ``split_len`` tokens become a new
        parent node (page-aligned by construction)."""
        new_node = TreeNode()
        new_node.key = child.key[:split_len]
        new_node.value = child.value[:split_len]
        new_node.parent = child.parent
        new_node.lock_ref = child.lock_ref
        new_node.children = {self._child_key(child.key[split_len:]): child}
        new_node.parent.children[self._child_key(new_node.key)] = new_node

        hashes = getattr(child, "kv_hashes", None)
        if hashes is not None:
            cut = split_len // self.page_size
            new_node.kv_hashes = hashes[:cut]
            child.kv_hashes = hashes[cut:]
        child.key = child.key[split_len:]
        child.value = child.value[split_len:]
        child.parent = new_node
        return new_node

    # ------------------------------------------------------------------
    def insert(self, key: List[int], value: np.ndarray, namespace: int = 0) -> int:
        """Insert ``key`` -> ``value`` (slot ids). Returns the number of
        leading tokens that were already present in the tree (whose newly
        computed slots are therefore duplicates the caller should free)."""
        assert len(key) == len(value)
        assert len(key) % self.page_size == 0
        node = self._get_root(namespace)
        node.last_access_time = TreeNode.tick()
        total_prefix = 0
        while key:
            child = node.children.get(self._child_key(key))
            if child is None:
                new_node = TreeNode()
                new_node.parent = node
                new_node.key = list(key)
                new_node.value = np.asarray(value, dtype=np.int32)
                node.children[self._child_key(key)] = new_node
                self.evictable_size_ += len(key)
                if self.events is not None:
                    from sglang_npu_tpu.mem_cache.kv_events import (
                        chain_hashes,
                        node_last_hash,
                    )

                    parent_h = node_last_hash(node, self.page_size)
                    new_node.kv_hashes = chain_hashes(
                        parent_h, new_node.key, self.page_size
                    )
                    self.events.block_stored(
                        new_node.kv_hashes, parent_h, len(key)
                    )
                return total_prefix
            child.last_access_time = TreeNode.tick()
            match_len = self._key_match(child.key, key)
            if match_len < len(child.key):
                child = self._split_node(child, match_len)
            total_prefix += match_len
            node = child
            key = key[match_len:]
            value = value[match_len:]
        return total_prefix

    # ------------------------------------------------------------------
    def cache_finished_req(self, req) -> None:
        """Take ownership of a finished request's KV into the tree.

        ``req`` duck-type: `.fill_ids` (all token ids with KV written),
        `.kv_slots` (np slot ids, same length), `.prefix_len`, `.last_node`.
        """
        ps = self.page_size
        slots = req.kv_slots
        token_ids = req.cache_key_seq()[: len(slots)] if hasattr(req, 'cache_key_seq') else req.fill_ids[: len(slots)]
        aligned = len(slots) // ps * ps
        old_prefix_len = min(req.prefix_len, aligned)
        ns = getattr(req, "lora_id", 0) or 0
        pre_existing = self.insert(
            token_ids[:aligned], slots[:aligned].copy(), namespace=ns
        )
        # Slots this request allocated that duplicate content already in the
        # tree (another request inserted the same prefix concurrently).
        if pre_existing > old_prefix_len:
            self.allocator.free_slots(slots[old_prefix_len:pre_existing])
        # Partial tail page never enters the tree.
        if aligned < len(slots):
            self.allocator.free_slots(slots[aligned:])
        locked = getattr(req, "locked_node", None)
        if locked is not None:
            self.dec_lock_ref(locked)
            req.locked_node = None

    # ------------------------------------------------------------------
    def cache_unfinished_req(self, req) -> None:
        """Publish an in-flight request's computed KV (e.g. after a chunked
        prefill step) and re-point the request at tree-owned slots."""
        ps = self.page_size
        slots = req.kv_slots
        token_ids = req.cache_key_seq()[: len(slots)] if hasattr(req, 'cache_key_seq') else req.fill_ids[: len(slots)]
        aligned = len(slots) // ps * ps
        old_prefix_len = min(req.prefix_len, aligned)
        ns = getattr(req, "lora_id", 0) or 0
        pre_existing = self.insert(
            token_ids[:aligned], slots[:aligned].copy(), namespace=ns
        )
        if pre_existing > old_prefix_len:
            self.allocator.free_slots(slots[old_prefix_len:pre_existing])

        res = self.match_prefix(token_ids[:aligned], namespace=ns)
        assert len(res.device_indices) == aligned, (
            f"radix repoint mismatch {len(res.device_indices)} != {aligned}"
        )
        req.kv_slots = np.concatenate([res.device_indices, slots[aligned:]]).astype(
            np.int32
        )
        # Transfer the request's single lock to the (deeper) new node.
        locked = getattr(req, "locked_node", None)
        if locked is not None:
            self.dec_lock_ref(locked)
        self.inc_lock_ref(res.last_node)
        req.locked_node = res.last_node
        req.last_node = res.last_node
        req.prefix_len = aligned

    # ------------------------------------------------------------------
    def evict(self, num_tokens: int) -> None:
        leaves = [
            n for n in self._collect_leaves() if n.lock_ref == 0 and not n.is_root
        ]
        heapq.heapify(leaves)
        evicted = 0
        while evicted < num_tokens and leaves:
            node = heapq.heappop(leaves)
            self.allocator.free_slots(node.value)
            evicted += len(node.value)
            self.evictable_size_ -= len(node.value)
            if self.events is not None:
                from sglang_npu_tpu.mem_cache.kv_events import node_last_hash

                node_last_hash(node, self.page_size)  # ensure computed
                self.events.block_removed(node.kv_hashes)
            parent = node.parent
            del parent.children[self._child_key(node.key)]
            if not parent.is_root and not parent.children and parent.lock_ref == 0:
                heapq.heappush(leaves, parent)

    def _collect_leaves(self) -> List[TreeNode]:
        out, stack = [], list(self.roots.values())
        while stack:
            n = stack.pop()
            if not n.children:
                out.append(n)
            else:
                stack.extend(n.children.values())
        return out

    # ------------------------------------------------------------------
    def inc_lock_ref(self, node: TreeNode) -> None:
        while node is not None and not node.is_root:
            if node.lock_ref == 0:
                self.evictable_size_ -= len(node.key)
                self.protected_size_ += len(node.key)
            node.lock_ref += 1
            node = node.parent

    def dec_lock_ref(self, node: TreeNode) -> None:
        while node is not None and not node.is_root:
            assert node.lock_ref > 0
            if node.lock_ref == 1:
                self.evictable_size_ += len(node.key)
                self.protected_size_ -= len(node.key)
            node.lock_ref -= 1
            node = node.parent

    # ------------------------------------------------------------------
    def evictable_size(self) -> int:
        return self.evictable_size_

    def protected_size(self) -> int:
        return self.protected_size_

    def total_size(self) -> int:
        total, stack = 0, list(self.roots.values())
        while stack:
            n = stack.pop()
            total += len(n.key)
            stack.extend(n.children.values())
        return total

    def pretty_print(self) -> str:
        lines = []

        def rec(node, depth):
            lines.append(
                "  " * depth
                + f"[{len(node.key)} tok, lock={node.lock_ref}] {node.key[:8]}"
            )
            for c in node.children.values():
                rec(c, depth + 1)

        for ns, root in self.roots.items():
            lines.append(f"namespace {ns}:")
            rec(root, 1)
        return "\n".join(lines)


class ChunkCache(BasePrefixCache):
    """No-prefix-sharing fallback (reference `chunk_cache.py:100`,
    `--disable-radix-cache`)."""

    def __init__(self, allocator: PagedAllocator, page_size: int):
        self.allocator = allocator
        self.page_size = page_size
        self.root_node = None

    def reset(self):
        pass

    def match_prefix(self, key: List[int], namespace: int = 0) -> MatchResult:
        return MatchResult(np.empty((0,), dtype=np.int32), None)

    def cache_finished_req(self, req) -> None:
        self.allocator.free_slots(req.kv_slots)

    def cache_unfinished_req(self, req) -> None:
        pass
