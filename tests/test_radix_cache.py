import numpy as np
import pytest

from sglang_npu_tpu.mem_cache.allocator import PagedAllocator
from sglang_npu_tpu.mem_cache.radix_cache import ChunkCache, RadixCache


def make(num_pages=64, page_size=1):
    a = PagedAllocator(num_pages=num_pages, page_size=page_size)
    return a, RadixCache(a, page_size)


def alloc_tokens(a, n, pages=None):
    pages = pages if pages is not None else []
    return a.alloc_extend(0, n, pages)


def test_insert_and_match():
    a, c = make()
    key = [1, 2, 3, 4, 5]
    slots = alloc_tokens(a, 5)
    assert c.insert(key, slots) == 0
    res = c.match_prefix([1, 2, 3, 9, 9])
    assert len(res.device_indices) == 3
    np.testing.assert_array_equal(res.device_indices, slots[:3])
    assert c.evictable_size() == 5


def test_insert_dedup_returns_existing_prefix():
    a, c = make()
    s1 = alloc_tokens(a, 4)
    c.insert([1, 2, 3, 4], s1)
    s2 = alloc_tokens(a, 6)
    pre = c.insert([1, 2, 3, 4, 5, 6], s2)
    assert pre == 4  # caller should free s2[:4]
    res = c.match_prefix([1, 2, 3, 4, 5, 6])
    assert len(res.device_indices) == 6
    # shared prefix keeps the ORIGINAL slots
    np.testing.assert_array_equal(res.device_indices[:4], s1)
    np.testing.assert_array_equal(res.device_indices[4:], s2[4:])


def test_node_split():
    a, c = make()
    s1 = alloc_tokens(a, 6)
    c.insert([1, 2, 3, 4, 5, 6], s1)
    s2 = alloc_tokens(a, 4)
    pre = c.insert([1, 2, 3, 9], s2)
    assert pre == 3
    r1 = c.match_prefix([1, 2, 3, 4, 5, 6])
    r2 = c.match_prefix([1, 2, 3, 9])
    assert len(r1.device_indices) == 6
    assert len(r2.device_indices) == 4
    np.testing.assert_array_equal(r2.device_indices[:3], s1[:3])


def test_page_aligned_matching():
    a, c = make(page_size=4)
    s = alloc_tokens(a, 8)
    c.insert(list(range(8)), s)
    # 6-token query matches only one full page (4 tokens)
    res = c.match_prefix([0, 1, 2, 3, 4, 5])
    assert len(res.device_indices) == 4
    # diverging within second page -> still only first page
    res = c.match_prefix([0, 1, 2, 3, 4, 99, 6, 7])
    assert len(res.device_indices) == 4


def test_eviction_lru_and_locks():
    a, c = make(num_pages=64)
    s1 = alloc_tokens(a, 4)
    c.insert([1, 2, 3, 4], s1)
    s2 = alloc_tokens(a, 4)
    c.insert([9, 9, 9, 9], s2)
    free_before = a.available_pages()

    # lock first branch; evict everything evictable
    res = c.match_prefix([1, 2, 3, 4])
    c.inc_lock_ref(res.last_node)
    assert c.protected_size() == 4
    assert c.evictable_size() == 4
    c.evict(100)
    assert c.evictable_size() == 0
    # locked branch survives
    assert len(c.match_prefix([1, 2, 3, 4]).device_indices) == 4
    assert len(c.match_prefix([9, 9, 9, 9]).device_indices) == 0
    assert a.available_pages() == free_before + 4

    c.dec_lock_ref(res.last_node)
    c.evict(100)
    assert len(c.match_prefix([1, 2, 3, 4]).device_indices) == 0
    assert c.total_size() == 0


def test_cache_finished_req_lifecycle():
    class FakeReq:
        pass

    a, c = make(num_pages=64, page_size=4)
    # simulate a request: 10 prompt tokens + 3 output, kv for 12 tokens
    req = FakeReq()
    req.fill_ids = list(range(100, 112)) + [999]
    pages = []
    req.kv_slots = a.alloc_extend(0, 12, pages)
    req.prefix_len = 0
    req.last_node = c.root_node
    used_before = 64 - 1 - a.available_pages()
    c.cache_finished_req(req)
    # 12 slots -> aligned 12 (3 pages) into tree; nothing freed yet
    assert c.evictable_size() == 12
    res = c.match_prefix(req.fill_ids[:12])
    assert len(res.device_indices) == 12

    # a second identical request: shares the prefix, frees its duplicates
    req2 = FakeReq()
    req2.fill_ids = req.fill_ids
    res2 = c.match_prefix(req2.fill_ids)
    req2.prefix_len = len(res2.device_indices)
    pages2 = list(res2.device_indices[::4] // 4)
    extra = a.alloc_extend(12, 14, pages2)
    req2.kv_slots = np.concatenate([res2.device_indices, extra])
    req2.last_node = res2.last_node
    req2.locked_node = res2.last_node
    c.inc_lock_ref(res2.last_node)
    avail = a.available_pages()
    c.cache_finished_req(req2)
    # the 2-token tail page freed back (12..14 not page aligned)
    assert a.available_pages() == avail + 1
    assert c.protected_size() == 0


def test_chunk_cache_noop():
    a = PagedAllocator(16, 2)
    c = ChunkCache(a, 2)
    assert len(c.match_prefix([1, 2, 3]).device_indices) == 0

    class FakeReq:
        pass

    r = FakeReq()
    pages = []
    r.kv_slots = a.alloc_extend(0, 6, pages)
    avail = a.available_pages()
    c.cache_finished_req(r)
    assert a.available_pages() == avail + 3
