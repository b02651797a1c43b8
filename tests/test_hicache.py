"""Hierarchical KV cache: evicted prefixes restore from the host tier with
correct content (reference hiradix_cache + cache_controller behavior)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.mem_cache.allocator import PagedAllocator
from sglang_npu_tpu.mem_cache.hiradix_cache import HiRadixCache

VOCAB = 128
PS = 4


class FakeKvIO:
    """Emulates the device pool with a host numpy array."""

    kv_bytes_per_token = 64

    def __init__(self, num_slots):
        self.pool = np.zeros((2, 2, 2, num_slots, 8), np.float32)  # L,2,H,n,D-ish

    def write(self, slots, base):
        for j, s in enumerate(slots):
            self.pool[:, :, :, s] = base + j

    def gather_kv(self, slots):
        return self.pool[:, :, :, slots].copy()

    def scatter_kv(self, slots, host_kv):
        self.pool[:, :, :, slots] = host_kv


def test_evict_backup_and_restore():
    a = PagedAllocator(num_pages=9, page_size=PS)  # 8 usable pages
    io = FakeKvIO(num_slots=9 * PS)
    c = HiRadixCache(a, PS, kv_io=io, host_bytes_budget=1 << 20)

    key1 = list(range(100, 116))  # 16 tokens = 4 pages
    s1 = a.alloc_extend(0, 16, [])
    io.write(s1, base=1000)
    c.insert(key1, s1)

    key2 = list(range(200, 216))
    s2 = a.alloc_extend(0, 16, [])
    io.write(s2, base=2000)
    c.insert(key2, s2)
    assert a.available_pages() == 0

    # force eviction of the LRU branch (key1)
    c.evict(16)
    assert a.available_pages() == 4
    assert len(c.match_prefix(key2).device_indices) == 16
    assert c.host_bytes > 0

    # free room, then matching key1 must RESTORE it from host
    res = c.match_prefix(key1)
    assert len(res.device_indices) == 16
    restored = io.pool[0, 0, 0, res.device_indices]
    np.testing.assert_array_equal(restored[:, 0], 1000 + np.arange(16))
    assert c.host_bytes == 0


def test_restore_evicts_other_branch_for_room():
    a = PagedAllocator(num_pages=5, page_size=PS)  # 4 usable pages
    io = FakeKvIO(num_slots=5 * PS)
    c = HiRadixCache(a, PS, kv_io=io, host_bytes_budget=1 << 20)

    key1 = list(range(0, 16))
    s1 = a.alloc_extend(0, 16, [])
    io.write(s1, 500)
    c.insert(key1, s1)
    c.evict(16)  # key1 -> host
    key2 = list(range(50, 66))
    s2 = a.alloc_extend(0, 16, [])
    io.write(s2, 700)
    c.insert(key2, s2)
    # restoring key1 must push key2 to host
    res = c.match_prefix(key1)
    assert len(res.device_indices) == 16
    np.testing.assert_array_equal(
        io.pool[0, 0, 0, res.device_indices][:, 0], 500 + np.arange(16)
    )
    # and key2 still restorable afterwards
    res2 = c.match_prefix(key2)
    assert len(res2.device_indices) == 16
    np.testing.assert_array_equal(
        io.pool[0, 0, 0, res2.device_indices][:, 0], 700 + np.arange(16)
    )


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
        # p1 again: prefix restored from host, output identical
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
