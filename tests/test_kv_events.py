"""KV cache event publishing (reference kv_events / vllm KVEventBatch)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.mem_cache.kv_events import chain_hashes

VOCAB = 128


def test_chain_hashes_deterministic_and_parent_dependent():
    a = chain_hashes("root", list(range(8)), 4)
    b = chain_hashes("root", list(range(8)), 4)
    assert a == b and len(a) == 2
    c = chain_hashes(a[0], list(range(4, 8)), 4)
    assert c[0] == a[1]  # chaining is position-consistent
    d = chain_hashes("other", list(range(8)), 4)
    assert d != a


def test_kv_events_stored_removed_cleared(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("kvev_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=1024, attention_backend="xla",
        random_seed=0, enable_kv_cache_events=True,
    )
    try:
        pub = e.scheduler.tree_cache.events
        assert pub is not None
        prompt = list(range(3, 19))  # 16 tokens = 4 pages
        e.generate(
            input_ids=[prompt],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        events = pub.take(0)
        stored = [ev for ev in events if ev["type"] == "block_stored"]
        assert stored, events
        assert stored[0]["parent_block_hash"] == "root"
        n_pages = sum(len(ev["block_hashes"]) for ev in stored)
        assert n_pages >= 4
        seq0 = pub.seq

        # same prefix again: radix hit, no duplicate stored events for the
        # shared pages (only the new decode tail may store)
        e.generate(
            input_ids=[prompt],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        again = [
            ev for ev in pub.take(seq0) if ev["type"] == "block_stored"
        ]
        first_hashes = set(h for ev in stored for h in ev["block_hashes"])
        for ev in again:
            assert not (set(ev["block_hashes"]) & first_hashes)

        # flush -> all_blocks_cleared
        e.flush_cache()
        types = [ev["type"] for ev in pub.take(0)]
        assert "all_blocks_cleared" in types
    finally:
        e.shutdown()
