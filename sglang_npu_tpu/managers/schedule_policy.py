"""Waiting-queue priority and prefill admission control.

Behavioral counterpart of the reference's `srt/managers/schedule_policy.py`
(`SchedulePolicy:77`, LPM/FCFS/LOF/RANDOM policies, `PrefillAdder:271`,
`add_one_req:497`, `add_chunked_req:382`).
"""

from __future__ import annotations

import random
from enum import Enum
from typing import List, Optional

from sglang_npu_tpu.managers.schedule_batch import Req
from sglang_npu_tpu.mem_cache.allocator import PagedAllocator
from sglang_npu_tpu.mem_cache.radix_cache import BasePrefixCache, RadixCache

# Cap on how many future decode tokens we budget per admitted request
# (reference CLIP_MAX_NEW_TOKENS_ESTIMATION).
CLIP_MAX_NEW_TOKENS_ESTIMATION = 512


class AddReqResult(Enum):
    CONTINUE = 1  # admitted, keep adding
    NO_TOKEN = 2  # out of token budget, stop
    OTHER = 3  # other limits (batch size), stop


class SchedulePolicy:
    def __init__(self, policy: str, tree_cache: BasePrefixCache):
        self.policy = policy
        self.tree_cache = tree_cache
        # What calc_priority actually ran last time: "lpm" falls back to
        # "fcfs" on a non-radix cache, and the scheduler must know whether
        # init_next_round_input already happened (advisor finding: gating on
        # the *configured* string left extend_input_len==0 under
        # `--schedule-policy lpm --disable-radix-cache`).
        self.effective_policy = policy

    def calc_priority(self, waiting_queue: List[Req], page_size: int = 1) -> list:
        """Sort the waiting queue in place. Returns the list of radix nodes
        that received a temporary lock during matching (caller must
        dec_lock_ref them after admission): matching req N+1 can trigger
        evictions (HiRadixCache restore), which must not free req N's
        matched-but-not-yet-admitted prefix."""
        policy = self.policy
        if policy in ("lpm", "dfs-weight") and not isinstance(
            self.tree_cache, RadixCache
        ):
            policy = "fcfs"
        self.effective_policy = policy
        if policy == "fcfs":
            return []
        if policy in ("lpm", "dfs-weight"):
            # Cache-aware: refresh each request's radix match first.
            temp_locked = []
            for r in waiting_queue:
                r.init_next_round_input(self.tree_cache, page_size)
                if r.last_node is not None and r.prefix_len > 0:
                    self.tree_cache.inc_lock_ref(r.last_node)
                    temp_locked.append(r.last_node)
            if policy == "dfs-weight":
                self._sort_dfs_weight(waiting_queue)
            else:
                # longest-prefix-match descending
                waiting_queue.sort(key=lambda r: -r.prefix_len)
            self._mark_in_batch_duplicates(waiting_queue, page_size)
            return temp_locked
        elif policy == "lof":
            waiting_queue.sort(key=lambda r: -len(r.origin_input_ids))
        elif policy == "random":
            random.shuffle(waiting_queue)
        return []

    def _sort_dfs_weight(self, waiting_queue: List[Req]) -> None:
        """DFS-weight order (reference `_calc_priority` dfs-weight,
        schedule_policy.py): order requests by a depth-first walk of the
        radix tree with heavier subtrees (more waiting requests) first, so
        admitted batches maximize shared prefixes and evictions touch cold
        subtrees last."""
        node_reqs: dict = {}
        weight: dict = {}
        roots: dict = {}
        unmatched: List[Req] = []
        for r in waiting_queue:
            node = r.last_node
            if node is None or r.prefix_len == 0:
                unmatched.append(r)
                continue
            node_reqs.setdefault(id(node), (node, []))[1].append(r)
            n = node
            while n is not None:
                weight[id(n)] = weight.get(id(n), 0) + 1
                if n.parent is None:
                    roots[id(n)] = n
                n = n.parent

        order: List[Req] = []

        def dfs(node):
            entry = node_reqs.get(id(node))
            if entry is not None:
                order.extend(entry[1])
            kids = [c for c in node.children.values() if id(c) in weight]
            kids.sort(key=lambda c: -weight[id(c)])
            for c in kids:
                dfs(c)

        for root in sorted(roots.values(), key=lambda n: -weight[id(n)]):
            dfs(root)
        order.extend(unmatched)  # no cached prefix: after the cache-hot set
        if len(order) == len(waiting_queue):
            waiting_queue[:] = order

    IN_BATCH_DEDUP_THRESHOLD = 32

    def _mark_in_batch_duplicates(
        self, waiting_queue: List[Req], page_size: int
    ) -> None:
        """In-batch prefix dedup (reference in-batch prefix caching check):
        when several waiting requests share a long UNCACHED prefix, admit
        only the first this round — once it lands in the radix cache, the
        rest prefill against it instead of each recomputing the prefix.
        Deferred requests get `defer_in_batch`; the admission loop skips
        them for one round."""
        thr = self.IN_BATCH_DEDUP_THRESHOLD
        seen: set = set()
        for r in waiting_queue:
            r.defer_in_batch = False
            uncached = r.fill_ids[r.prefix_len:]
            if len(uncached) < thr:
                continue
            key = tuple(uncached[:thr])
            if key in seen:
                r.defer_in_batch = True
            else:
                seen.add(key)


class PrefillAdder:
    """Builds one prefill batch under token budgets (reference
    `PrefillAdder:271`)."""

    def __init__(
        self,
        page_size: int,
        tree_cache: BasePrefixCache,
        allocator: PagedAllocator,
        running_tokens: int,
        max_prefill_tokens: int,
        chunked_prefill_size: int,
        max_batch_size: int,
        new_token_ratio: float = 1.0,
        swa=None,
    ):
        self.page_size = page_size
        self.tree_cache = tree_cache
        self.allocator = allocator
        self.can_run_list: List[Req] = []
        self.new_chunked_req: Optional[Req] = None
        self.max_batch_size = max_batch_size
        self.new_token_ratio = new_token_ratio

        # Token slots still free for new work (free pages + evictable tree).
        self.rem_total_tokens = (
            allocator.available_size() + tree_cache.evictable_size() - running_tokens
        )
        self.rem_input_tokens = max_prefill_tokens
        self.rem_chunk_tokens = chunked_prefill_size
        # Sliding-window models: each admitted request needs one page ring
        # in the window pool (constant NW pages — the memory bound).
        self.rem_swa_rings = None
        if swa is not None:
            self.rem_swa_rings = (
                swa.allocator.available_pages()
                + tree_cache.evictable_swa_size() // page_size
            ) // swa.ring_pages

    # ------------------------------------------------------------------
    def _lock_req_prefix(self, req: Req) -> None:
        """Pin the matched prefix the moment the request is admitted
        (reference `PrefillAdder.add_one_req` inc_lock_ref,
        schedule_policy.py:516,541): every batch member must be locked
        BEFORE any member's extend allocation can evict."""
        if req.locked_node is not req.last_node:
            if req.locked_node is not None:
                self.tree_cache.dec_lock_ref(req.locked_node)
            if req.last_node is not None:
                self.tree_cache.inc_lock_ref(req.last_node)
            req.locked_node = req.last_node

    def _estimate_total_cost(self, req: Req) -> int:
        decode_est = min(
            req.sampling_params.max_new_tokens, CLIP_MAX_NEW_TOKENS_ESTIMATION
        )
        return req.extend_input_len + int(decode_est * self.new_token_ratio)

    def add_one_req(self, req: Req) -> AddReqResult:
        if len(self.can_run_list) >= self.max_batch_size:
            return AddReqResult.OTHER
        if self.new_chunked_req is not None:
            # Only one chunked request per batch (it fills the chunk budget).
            return AddReqResult.OTHER
        if req.prefix_loading > 0:
            # Part of this request's prefix is being restored from a lower
            # HiCache tier: defer it (recomputing would waste the restore);
            # later requests may still be admitted this round.
            return AddReqResult.CONTINUE

        extend_len = req.extend_input_len
        if extend_len == 0:
            # Fully-cached input: still must forward the last token.
            extend_len = 1

        if self._estimate_total_cost(req) > self.rem_total_tokens:
            return AddReqResult.NO_TOKEN
        if self.rem_swa_rings is not None and not req.swa_pages:
            if self.rem_swa_rings < 1:
                return AddReqResult.NO_TOKEN
        if extend_len > self.rem_input_tokens and len(self.can_run_list) > 0:
            return AddReqResult.OTHER

        if extend_len > self.rem_chunk_tokens:
            # Chunked prefill: truncate this round's extend to the chunk
            # budget, page-aligned (reference `add_chunked_req:382`).
            trunc = self.rem_chunk_tokens // self.page_size * self.page_size
            if trunc == 0:
                return AddReqResult.OTHER
            req.extend_input_len = trunc
            req.fill_ids = req.fill_ids[: req.prefix_len + trunc]
            req.is_chunked += 1
            self.new_chunked_req = req
            self.can_run_list.append(req)
            self._lock_req_prefix(req)
            if self.rem_swa_rings is not None and not req.swa_pages:
                self.rem_swa_rings -= 1
            self.rem_chunk_tokens = 0
            self.rem_input_tokens -= trunc
            self.rem_total_tokens -= trunc
            return AddReqResult.OTHER

        self.can_run_list.append(req)
        self._lock_req_prefix(req)
        if self.rem_swa_rings is not None and not req.swa_pages:
            self.rem_swa_rings -= 1
        self.rem_chunk_tokens -= extend_len
        self.rem_input_tokens -= extend_len
        self.rem_total_tokens -= self._estimate_total_cost(req)
        return AddReqResult.CONTINUE

    def add_chunked_req(self, req: Req) -> None:
        """Re-admit the in-progress chunked request first (it already owns
        KV and must continue before anything else)."""
        req.init_next_round_input(self.tree_cache, self.page_size)
        self._lock_req_prefix(req)
        if req.extend_input_len > self.rem_chunk_tokens:
            trunc = self.rem_chunk_tokens // self.page_size * self.page_size
            req.extend_input_len = max(trunc, self.page_size if trunc == 0 else trunc)
            req.fill_ids = req.fill_ids[: req.prefix_len + req.extend_input_len]
            req.is_chunked += 1
            self.new_chunked_req = req
        self.can_run_list.append(req)
        self.rem_chunk_tokens -= req.extend_input_len
        self.rem_input_tokens -= req.extend_input_len
        self.rem_total_tokens -= req.extend_input_len
