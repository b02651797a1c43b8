"""Host-side KV slot allocation.

TPU-native re-design of the reference's `srt/mem_cache/allocator.py`
(`TokenToKVPoolAllocator:117`, `PagedTokenToKVPoolAllocator:404`) and
`memory_pool.py` `ReqToTokenPool:47`.

The device KV pool is a preallocated jax array of ``num_pages * page_size``
token slots (see `mem_cache/kv_pool.py`).  Allocation bookkeeping lives
entirely on the host as a page free-list; the scheduler hands each request a
growing int32 array of *token slot ids* whose page view
(``slots[::page_size] // page_size``) becomes the device page table row.

Invariants:
  * Every request owns whole pages; a page is never shared by two requests
    unless it is owned by the radix tree (shared prefix).
  * The radix tree only ever owns fully-filled pages; partial tail pages are
    freed when a request finishes (mirrors the reference's page-aligned
    truncation in `radix_cache.cache_finished_req`).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class PagedAllocator:
    """Free-list page allocator over the device KV pool.

    With ``num_ranks > 1`` (DP-attention, see
    `model_executor/dp_attention.py`) the page-id space is partitioned into
    contiguous per-rank ranges — rank ``r`` owns global ids
    ``[r*pages_local, (r+1)*pages_local)`` matching the pool's page-dim
    sharding over the mesh ``data`` axis — and each rank's local page 0 is
    reserved as its padding/garbage page.  Allocations draw from the
    request's rank; frees route by id.
    """

    def __init__(self, num_pages: int, page_size: int, num_ranks: int = 1):
        assert num_pages % num_ranks == 0
        self.num_pages = num_pages
        self.page_size = page_size
        self.num_ranks = num_ranks
        self.pages_local = num_pages // num_ranks
        self.size = num_pages * page_size  # total token slots
        self.release_pages: List[int] = []
        self.clear()

    def clear(self):
        # LIFO free lists; each rank's local page 0 is reserved as the
        # "padding page" so padded page-table entries point at valid memory.
        self.free_lists = [
            list(
                range(
                    (r + 1) * self.pages_local - 1, r * self.pages_local, -1
                )
            )
            for r in range(self.num_ranks)
        ]

    @property
    def free_list(self):  # single-rank view (tests, debug)
        assert self.num_ranks == 1
        return self.free_lists[0]

    # ------------------------------------------------------------------
    def available_pages(self) -> int:
        """Admission-safe free-page count: with per-rank partitions the
        bound is the tightest rank (a request draws from one rank only)."""
        if self.num_ranks == 1:
            return len(self.free_lists[0])
        return min(len(fl) for fl in self.free_lists) * self.num_ranks

    def available_pages_rank(self, rank: int) -> int:
        return len(self.free_lists[rank])

    def available_size(self) -> int:
        """Free token slots (reference `available_size`)."""
        return self.available_pages() * self.page_size

    # ------------------------------------------------------------------
    def alloc_pages(self, n: int, rank: int = 0) -> Optional[List[int]]:
        fl = self.free_lists[rank]
        if n > len(fl):
            return None
        if n == 0:
            return []
        pages = fl[-n:][::-1]
        del fl[-n:]
        return pages

    def free_page_ids(self, pages) -> None:
        for p in pages:
            p = int(p)
            self.free_lists[p // self.pages_local].append(p)

    # ------------------------------------------------------------------
    def pages_needed(self, old_len: int, new_len: int) -> int:
        ps = self.page_size
        return -(-new_len // ps) - (-(-old_len // ps))

    def alloc_extend(
        self, old_len: int, new_len: int, pages: List[int], rank: int = 0
    ) -> Optional[np.ndarray]:
        """Extend a request from ``old_len`` to ``new_len`` tokens.

        ``pages`` is the request's page list (mutated in place: new pages are
        appended).  Returns the slot ids for tokens [old_len, new_len), or
        None if out of memory (allocation is all-or-nothing).
        """
        ps = self.page_size
        need = self.pages_needed(old_len, new_len)
        new_pages = self.alloc_pages(need, rank)
        if new_pages is None:
            return None
        pages.extend(new_pages)
        positions = np.arange(old_len, new_len, dtype=np.int64)
        page_arr = np.asarray(pages, dtype=np.int64)
        slots = page_arr[positions // ps] * ps + positions % ps
        return slots.astype(np.int32)

    def free_slots(self, slots: np.ndarray) -> None:
        """Free the pages covered by ``slots``.

        Only legal when the slots cover their pages exclusively (request tail
        or evicted radix nodes).  Computes the unique page set.
        """
        if len(slots) == 0:
            return
        pages = np.unique(np.asarray(slots) // self.page_size)
        self.free_page_ids(pages.tolist())

    def shrink_req(self, req, new_len: int) -> None:
        """Truncate a request's slot array to ``new_len`` tokens, freeing
        pages that become wholly unused (multi-step decode windows allocate
        K slots up front; early finishes return the tail)."""
        ps = self.page_size
        if new_len >= len(req.kv_slots):
            return
        keep_pages = -(-new_len // ps)
        drop = req.pages[keep_pages:]
        if drop:
            self.free_page_ids(drop)
            req.pages = req.pages[:keep_pages]
        req.kv_slots = req.kv_slots[:new_len]


class ReqSlotPool:
    """Request-slot bookkeeping (reference `ReqToTokenPool:47`).

    On TPU the page table is rebuilt per batch from each request's slot
    array, so this pool only tracks which request slots are live (used for
    max_running_requests accounting and debug dumps).
    """

    def __init__(self, max_reqs: int):
        self.max_reqs = max_reqs
        self.free_slots = list(range(max_reqs))

    def alloc(self) -> Optional[int]:
        if not self.free_slots:
            return None
        return self.free_slots.pop()

    def free(self, slot: int) -> None:
        self.free_slots.append(slot)

    def available_size(self) -> int:
        return len(self.free_slots)

    def clear(self):
        self.free_slots = list(range(self.max_reqs))
