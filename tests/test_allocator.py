import numpy as np
import pytest

from sglang_npu_tpu.mem_cache.allocator import PagedAllocator, ReqSlotPool


def test_alloc_extend_basic():
    a = PagedAllocator(num_pages=8, page_size=4)
    pages = []
    slots = a.alloc_extend(0, 6, pages)
    assert len(slots) == 6
    assert len(pages) == 2
    # within-page contiguity
    assert slots[1] == slots[0] + 1
    assert a.available_pages() == 8 - 1 - 2  # page 0 reserved

    # extend into the same partial page: no new page needed
    slots2 = a.alloc_extend(6, 8, pages)
    assert len(slots2) == 2
    assert len(pages) == 2
    assert slots2[0] == pages[1] * 4 + 2

    # next token needs a fresh page
    slots3 = a.alloc_extend(8, 9, pages)
    assert len(pages) == 3
    assert slots3[0] == pages[2] * 4


def test_alloc_oom_returns_none():
    a = PagedAllocator(num_pages=3, page_size=2)  # 2 usable pages
    pages = []
    assert a.alloc_extend(0, 10, pages) is None
    assert pages == []
    got = a.alloc_extend(0, 4, pages)
    assert got is not None
    assert a.available_pages() == 0


def test_free_slots_roundtrip():
    a = PagedAllocator(num_pages=5, page_size=4)
    pages = []
    slots = a.alloc_extend(0, 16, pages)
    assert a.available_pages() == 0
    a.free_slots(slots)
    assert a.available_pages() == 4


def test_pages_needed():
    a = PagedAllocator(num_pages=10, page_size=16)
    assert a.pages_needed(0, 1) == 1
    assert a.pages_needed(0, 16) == 1
    assert a.pages_needed(0, 17) == 2
    assert a.pages_needed(16, 17) == 1
    assert a.pages_needed(15, 16) == 0
    assert a.pages_needed(31, 32) == 0


def test_req_slot_pool():
    p = ReqSlotPool(2)
    s1, s2 = p.alloc(), p.alloc()
    assert p.alloc() is None
    p.free(s1)
    assert p.alloc() == s1
