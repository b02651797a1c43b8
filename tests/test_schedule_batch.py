import numpy as np
import pytest

from sglang_npu_tpu.managers.schedule_batch import (
    FINISH_LENGTH,
    FINISH_MATCHED_TOKEN,
    ForwardMode,
    Req,
    ScheduleBatch,
)
from sglang_npu_tpu.managers.schedule_policy import (
    AddReqResult,
    PrefillAdder,
    SchedulePolicy,
)
from sglang_npu_tpu.mem_cache.allocator import PagedAllocator
from sglang_npu_tpu.mem_cache.radix_cache import RadixCache
from sglang_npu_tpu.sampling.sampling_params import SamplingParams


PS = 4


def setup(num_pages=256):
    a = PagedAllocator(num_pages=num_pages, page_size=PS)
    c = RadixCache(a, PS)
    return a, c


def mkreq(rid, ids, max_new=8, **kw):
    return Req(
        rid=rid,
        origin_input_text=None,
        origin_input_ids=list(ids),
        sampling_params=SamplingParams(max_new_tokens=max_new, **kw),
        eos_token_ids={0},
    )


def test_prepare_for_extend_and_decode():
    a, c = setup()
    r1 = mkreq("a", [1, 2, 3, 4, 5])
    r2 = mkreq("b", [1, 2, 3, 4, 5, 6, 7])
    for r in (r1, r2):
        r.init_next_round_input(c, PS)
    b = ScheduleBatch.init_new([r1, r2], a, c)
    mwb = b.prepare_for_extend()
    assert mwb.forward_mode == ForwardMode.EXTEND
    assert len(mwb.input_ids) == 12
    np.testing.assert_array_equal(mwb.seq_lens, [5, 7])
    np.testing.assert_array_equal(mwb.extend_seq_lens, [5, 7])
    np.testing.assert_array_equal(mwb.positions[:5], np.arange(5))
    assert len(mwb.out_slots) == 12
    # page table rows point at each req's pages
    assert mwb.page_tables.shape[0] == 2
    assert len(r1.kv_slots) == 5 and len(r2.kv_slots) == 7

    # decode step: sampled tokens appended
    r1.output_ids.append(10)
    r1.fill_ids.append(10)
    r2.output_ids.append(11)
    r2.fill_ids.append(11)
    mwb2 = b.prepare_for_decode()
    assert mwb2.forward_mode == ForwardMode.DECODE
    np.testing.assert_array_equal(mwb2.input_ids, [10, 11])
    np.testing.assert_array_equal(mwb2.seq_lens, [6, 8])
    np.testing.assert_array_equal(mwb2.positions, [5, 7])
    assert len(r1.kv_slots) == 6


def test_prefix_reuse_page_aligned():
    a, c = setup()
    r1 = mkreq("a", list(range(100, 110)))
    r1.init_next_round_input(c, PS)
    b = ScheduleBatch.init_new([r1], a, c)
    b.prepare_for_extend()
    # pretend finished with 1 output token (kv covers all 10 inputs)
    r1.output_ids = [7]
    r1.fill_ids = r1.origin_input_ids + [7]
    c.cache_finished_req(r1)

    # same prompt again: should reuse 2 full pages (8 tokens)
    r2 = mkreq("b", list(range(100, 110)))
    r2.init_next_round_input(c, PS)
    assert r2.prefix_len == 8
    assert r2.extend_input_len == 2
    assert r2.cached_tokens == 8


def test_full_prefix_hit_still_extends_one_page():
    a, c = setup()
    slots = a.alloc_extend(0, 8, [])
    c.insert(list(range(8)), slots)
    r = mkreq("x", list(range(8)))
    r.init_next_round_input(c, PS)
    # entire input cached, but we must recompute at least the last page
    assert r.prefix_len == 4
    assert r.extend_input_len == 4


def test_check_finished():
    r = mkreq("a", [1, 2, 3], max_new=4)
    r.output_ids = [5]
    r.check_finished()
    assert not r.finished
    r.output_ids = [5, 0]  # eos
    r.check_finished()
    assert isinstance(r.finished_reason, FINISH_MATCHED_TOKEN)

    r2 = mkreq("b", [1], max_new=2, ignore_eos=True)
    r2.output_ids = [0, 0]
    r2.check_finished()
    assert isinstance(r2.finished_reason, FINISH_LENGTH)


def test_retract_decode_frees_memory():
    a, c = setup(num_pages=7)  # 6 usable pages = 24 tokens
    reqs = [mkreq(f"r{i}", list(range(i * 50, i * 50 + 8)), max_new=64) for i in range(3)]
    for r in reqs:
        r.init_next_round_input(c, PS)
    b = ScheduleBatch.init_new(reqs, a, c)
    b.prepare_for_extend()  # 24 tokens = 6 pages, pool now full
    assert a.available_pages() == 0
    # every decode step now needs a fresh page per req -> must retract
    assert not b.decode_token_budget_ok()
    retracted = b.retract_decode()
    assert len(retracted) >= 1
    assert b.decode_token_budget_ok(extra_steps=1)
    assert a.available_pages() >= 2
    for r in retracted:
        assert len(r.kv_slots) == 0
        assert r.pages == []


def test_prefill_adder_budgets():
    a, c = setup()
    adder = PrefillAdder(
        page_size=PS,
        tree_cache=c,
        allocator=a,
        running_tokens=0,
        max_prefill_tokens=100,
        chunked_prefill_size=16,
        max_batch_size=8,
    )
    r1 = mkreq("a", list(range(10)), max_new=4)
    r1.init_next_round_input(c, PS)
    assert adder.add_one_req(r1) == AddReqResult.CONTINUE

    # this one exceeds the remaining chunk budget (16-10=6) -> chunked
    r2 = mkreq("b", list(range(200, 220)), max_new=4)
    r2.init_next_round_input(c, PS)
    res = adder.add_one_req(r2)
    assert res == AddReqResult.OTHER
    assert adder.new_chunked_req is r2
    assert r2.extend_input_len == 4  # 6 // 4 * 4
    assert r2.is_chunked == 1
    assert len(r2.fill_ids) == 4


def test_schedule_policy_lpm_orders_by_prefix():
    a, c = setup()
    slots = a.alloc_extend(0, 8, [])
    c.insert(list(range(8)), slots)
    r_hit = mkreq("hit", list(range(8)) + [99, 98])
    r_miss = mkreq("miss", [55, 56, 57, 58])
    q = [r_miss, r_hit]
    SchedulePolicy("lpm", c).calc_priority(q, PS)
    assert q[0] is r_hit
