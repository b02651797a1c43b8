"""Hierarchical KV cache: async host-tier backup/restore + storage tier
(reference hiradix_cache + cache_controller + hicache_storage behavior)."""

import time

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.mem_cache.allocator import PagedAllocator
from sglang_npu_tpu.mem_cache.hicache_storage import MemoryStorage
from sglang_npu_tpu.mem_cache.hiradix_cache import HiRadixCache

VOCAB = 128
PS = 4


class FakeKvIO:
    """Emulates the device pool + the dispatch/fetch IO split with a host
    numpy array (snapshot-at-dispatch, like the real gather)."""

    def __init__(self, num_slots, fetch_delay=0.0):
        self.pool = np.zeros((2, 2, 2, num_slots, 8), np.float32)  # L,2,H,n,D
        self.fetch_delay = fetch_delay

    def write(self, slots, base):
        for j, s in enumerate(slots):
            self.pool[:, :, :, s] = base + j

    # -- async IO surface (ModelRunner.gather_kv_dispatch etc.) --
    def gather_kv_dispatch(self, slots):
        return self.pool[:, :, :, slots].copy()  # snapshot at dispatch order

    def gather_kv_fetch(self, handle):
        if self.fetch_delay:
            time.sleep(self.fetch_delay)
        return handle

    def scatter_kv_upload(self, host_kv, n):
        if self.fetch_delay:
            time.sleep(self.fetch_delay)
        return host_kv

    def scatter_kv_commit(self, slots, handle):
        self.pool[:, :, :, slots] = handle


def drain(c: HiRadixCache, timeout=5.0):
    """Poll until all background jobs have been attached."""
    deadline = time.time() + timeout
    while c.pending_jobs():
        c.poll()
        if time.time() > deadline:
            raise TimeoutError("hicache jobs did not drain")
        time.sleep(0.001)


def match_with_restore(c: HiRadixCache, key):
    """match_prefix, waiting out any async restores (as the scheduler's
    defer-and-retry admission loop does)."""
    deadline = time.time() + 5.0
    while True:
        res = c.match_prefix(key)
        if res.loading == 0:
            return res
        drain(c)
        assert time.time() < deadline


def make_cache(num_pages=9, **kw):
    a = PagedAllocator(num_pages=num_pages, page_size=PS)
    io = FakeKvIO(num_slots=num_pages * PS)
    c = HiRadixCache(a, PS, kv_io=io, host_bytes_budget=kw.pop("budget", 1 << 20), **kw)
    return a, io, c


def test_evict_backup_and_restore():
    a, io, c = make_cache(num_pages=9)  # 8 usable pages

    key1 = list(range(100, 116))  # 16 tokens = 4 pages
    s1 = a.alloc_extend(0, 16, [])
    io.write(s1, base=1000)
    c.insert(key1, s1)

    key2 = list(range(200, 216))
    s2 = a.alloc_extend(0, 16, [])
    io.write(s2, base=2000)
    c.insert(key2, s2)
    assert a.available_pages() == 0
    drain(c)  # write-through backups land

    # force eviction of the LRU branch (key1): instant (already backed up)
    c.evict(16)
    assert a.available_pages() == 4
    assert len(c.match_prefix(key2).device_indices) == 16
    assert c.host_bytes > 0

    # matching key1 kicks off an async restore; the first match reports
    # loading, and once drained the prefix is resident again
    res0 = c.match_prefix(key1)
    assert len(res0.device_indices) == 0 and res0.loading == 16
    res = match_with_restore(c, key1)
    assert len(res.device_indices) == 16
    restored = io.pool[0, 0, 0, res.device_indices]
    np.testing.assert_array_equal(restored[:, 0], 1000 + np.arange(16))


def test_write_back_policy_backs_up_at_evict():
    a, io, c = make_cache(num_pages=9, write_policy="write_back")
    key1 = list(range(100, 116))
    s1 = a.alloc_extend(0, 16, [])
    io.write(s1, base=1000)
    c.insert(key1, s1)
    drain(c)
    assert c.host_bytes == 0  # write_back: nothing backed up yet

    c.evict(16)  # dispatches the gather, frees pages immediately
    assert a.available_pages() == 8
    # overwrite the freed pool rows: the dispatched snapshot must survive
    io.pool[:] = -1
    res = match_with_restore(c, key1)
    assert len(res.device_indices) == 16
    np.testing.assert_array_equal(
        io.pool[0, 0, 0, res.device_indices][:, 0], 1000 + np.arange(16)
    )


def test_eviction_does_not_block_on_slow_host():
    a, io, c = make_cache(num_pages=9, write_policy="write_back")
    io.fetch_delay = 0.2
    key1 = list(range(100, 116))
    s1 = a.alloc_extend(0, 16, [])
    io.write(s1, base=1000)
    c.insert(key1, s1)
    t0 = time.time()
    c.evict(16)
    assert time.time() - t0 < 0.1  # gather dispatched, fetch in background
    assert a.available_pages() == 8
    res = match_with_restore(c, key1)
    assert len(res.device_indices) == 16


def test_restore_evicts_other_branch_for_room():
    a, io, c = make_cache(num_pages=5)  # 4 usable pages

    key1 = list(range(0, 16))
    s1 = a.alloc_extend(0, 16, [])
    io.write(s1, 500)
    c.insert(key1, s1)
    drain(c)
    c.evict(16)  # key1 -> host
    key2 = list(range(50, 66))
    s2 = a.alloc_extend(0, 16, [])
    io.write(s2, 700)
    c.insert(key2, s2)
    drain(c)
    # restoring key1 must push key2 out (it is backed up, eviction is free)
    res = match_with_restore(c, key1)
    assert len(res.device_indices) == 16
    np.testing.assert_array_equal(
        io.pool[0, 0, 0, res.device_indices][:, 0], 500 + np.arange(16)
    )
    # and key2 still restorable afterwards
    res2 = match_with_restore(c, key2)
    assert len(res2.device_indices) == 16
    np.testing.assert_array_equal(
        io.pool[0, 0, 0, res2.device_indices][:, 0], 700 + np.arange(16)
    )


def test_storage_spill_and_restore():
    """Host-budget overflow spills to the storage tier instead of dropping."""
    store = MemoryStorage()
    # budget of one 16-token node's host bytes: second backup spills first
    a, io, c = make_cache(num_pages=9, budget=1, storage=store)

    key1 = list(range(100, 116))
    s1 = a.alloc_extend(0, 16, [])
    io.write(s1, base=1000)
    c.insert(key1, s1)
    drain(c)  # backup lands, over budget -> spilled to storage
    assert c.host_bytes == 0
    assert len(store.store) == 4  # 4 pages
    c.evict(16)
    res = match_with_restore(c, key1)
    assert len(res.device_indices) == 16
    np.testing.assert_array_equal(
        io.pool[0, 0, 0, res.device_indices][:, 0], 1000 + np.arange(16)
    )


def test_storage_probe_survives_restart():
    """A fresh cache (new tree) finds pages in shared storage by content
    hash — prefix reuse across server restarts."""
    store = MemoryStorage()
    a1, io1, c1 = make_cache(num_pages=9, budget=1, storage=store)
    key = list(range(100, 116))
    s1 = a1.alloc_extend(0, 16, [])
    io1.write(s1, base=1000)
    c1.insert(key, s1)
    drain(c1)
    assert len(store.store) == 4
    c1.shutdown()

    # "restart": brand-new tree/allocator/pool, same storage
    a2, io2, c2 = make_cache(num_pages=9, storage=store)
    res = c2.match_prefix(key)
    assert len(res.device_indices) == 0  # cold tree; probe kicked off
    drain(c2)  # probe fetches pages -> host-tier tombstone
    res = match_with_restore(c2, key)
    assert len(res.device_indices) == 16
    np.testing.assert_array_equal(
        io2.pool[0, 0, 0, res.device_indices][:, 0], 1000 + np.arange(16)
    )
    c2.shutdown()


def test_partial_prefix_restore_after_split():
    """Restoring a shorter prefix of an evicted node splits the tombstone
    and restores only the matched span."""
    a, io, c = make_cache(num_pages=9)
    key = list(range(100, 132))  # 32 tokens = 8 pages
    s = a.alloc_extend(0, 32, [])
    io.write(s, base=4000)
    c.insert(key, s)
    drain(c)
    c.evict(32)
    assert a.available_pages() == 8
    res = match_with_restore(c, key[:16])
    assert len(res.device_indices) == 16
    np.testing.assert_array_equal(
        io.pool[0, 0, 0, res.device_indices][:, 0], 4000 + np.arange(16)
    )
    # the tail is still restorable
    res2 = match_with_restore(c, key)
    assert len(res2.device_indices) == 32


def test_engine_hicache_end_to_end(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("hicache_model")
    hf.save_pretrained(d, safe_serialization=True)
    # tiny device pool: 160 tokens forces eviction between requests
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=160, attention_backend="xla",
        random_seed=0, enable_hierarchical_cache=True, hicache_size_gb=1.0,
    )
    try:
        rng = np.random.default_rng(0)
        p1 = rng.integers(3, VOCAB, size=60).tolist()
        p2 = rng.integers(3, VOCAB, size=60).tolist()
        sp = {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}
        o1 = e.generate(input_ids=p1, sampling_params=sp)
        e.generate(input_ids=p2, sampling_params=sp)  # evicts p1's pages
        # p1 again: prefix restored from host (async; the scheduler defers
        # admission until the restore lands), output identical
        o1b = e.generate(input_ids=p1, sampling_params=sp)
        assert o1b["output_ids"] == o1["output_ids"]
        assert o1b["meta_info"]["cached_tokens"] >= 40
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([p1]), max_new_tokens=4, do_sample=False
            )[0][60:].tolist()
        assert o1b["output_ids"] == ref
    finally:
        e.shutdown()


def test_engine_hicache_storage_backend(tmp_path_factory, tmp_path):
    """File storage tier end-to-end: prefix reuse survives an engine
    restart via content-addressed page files."""
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("hicache_store_model")
    hf.save_pretrained(d, safe_serialization=True)
    store_dir = str(tmp_path / "kvstore")
    kw = dict(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=160, attention_backend="xla",
        random_seed=0, enable_hierarchical_cache=True,
        # ~0 host budget: every backup spills straight to the file tier
        hicache_size_gb=1e-9,
        hicache_storage_backend="file", hicache_storage_path=store_dir,
    )
    rng = np.random.default_rng(0)
    p1 = rng.integers(3, VOCAB, size=60).tolist()
    sp = {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}

    e = Engine(**kw)
    try:
        o1 = e.generate(input_ids=p1, sampling_params=sp)
    finally:
        e.shutdown()

    e2 = Engine(**kw)
    try:
        # the FIRST post-restart request already reuses the file tier: the
        # scheduler defers admission on the in-flight probe + restore
        o1b = e2.generate(input_ids=p1, sampling_params=sp)
        assert o1b["output_ids"] == o1["output_ids"]
        assert o1b["meta_info"]["cached_tokens"] >= 40
    finally:
        e2.shutdown()


def test_connector_storage_roundtrip(tmp_path):
    """HiCache third tier through a connector URL (redis/s3-class; file://
    here since the environment has no external services)."""
    import numpy as np

    try:
        import ml_dtypes
        bf16 = ml_dtypes.bfloat16
    except ImportError:
        bf16 = np.float32
    from sglang_npu_tpu.mem_cache.hicache_storage import make_storage

    st = make_storage("connector", f"file://{tmp_path}/kvstore")
    arr = (np.arange(48, dtype=np.float32) / 7).astype(bf16)
    assert not st.exists("h123")
    assert st.set("h123", arr)
    assert st.exists("h123")
    back = st.get("h123")
    assert back.dtype == arr.dtype
    assert (back == arr).all()
    assert st.get("missing") is None
