"""EPLB (expert-parallel load balancing) on the virtual CPU mesh.

Reference behaviors: `srt/eplb/eplb_manager.py:20` (periodic rebalance),
`srt/eplb/eplb_algorithms/deepseek.py` (replica allocation + packing),
`srt/eplb/expert_location.py` (physical<->logical maps, weight update by
permutation), `srt/eplb/expert_distribution.py` (routed-token recorder).

Key invariant: replicas share weights, so a rebalance must be
numerics-invariant — greedy outputs bit-identical before and after.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.layers.eplb import (
    EplbState,
    allocate_replicas,
    compute_placement,
    pack_slots,
)

VOCAB = 128


# ----------------------------------------------------------------------
# placement algorithm units
# ----------------------------------------------------------------------
def test_allocate_replicas_prefers_hot_experts():
    load = np.array([100.0, 10.0, 10.0, 10.0])
    rc = allocate_replicas(load, n_slots=8)
    assert rc.sum() == 8
    assert (rc >= 1).all()
    assert rc[0] == rc.max()  # the hot expert gets the extra copies


def test_pack_slots_fills_every_rank_slot():
    load = np.array([40.0, 30.0, 20.0, 10.0])
    rc = allocate_replicas(load, 8)
    p2l = pack_slots(load, rc, ep=4, slots_per_rank=2)
    assert p2l.shape == (8,)
    # each rank has exactly slots_per_rank entries, all valid experts
    assert ((p2l >= 0) & (p2l < 4)).all()
    counts = np.bincount(p2l, minlength=4)
    assert (counts >= 1).all()  # every expert placed somewhere


def test_compute_placement_balances_better_than_identity():
    rng = np.random.default_rng(0)
    load = rng.integers(1, 1000, size=8).astype(np.float64)
    load[3] = 5000  # one hot expert
    ep = 4
    p2l, l2p, rc = compute_placement(load, ep=ep, n_redundant=4)
    P = 12
    # per-rank load under the new placement (replica load split evenly)
    per_replica = load / np.maximum(np.bincount(p2l, minlength=8), 1)
    new_rank = per_replica[p2l].reshape(ep, -1).sum(1)
    ident_rank = load.reshape(ep, -1).sum(1)
    assert new_rank.max() < ident_rank.max()
    # l2p rows point at slots that really hold that expert
    for e in range(8):
        for r in range(rc[e]):
            assert p2l[l2p[e, r]] == e
        # padded replica columns stay on the primary
        assert (l2p[e, rc[e]:] == l2p[e, 0]).all()


def test_eplb_state_rebalance_gather_points_at_live_weights():
    st = EplbState.initial(n_layers=2, num_experts=4, n_redundant=2, ep=2)
    counts = np.array([[100, 5, 5, 5], [5, 5, 100, 5]], dtype=np.int64)
    gather, l2p, rc = st.rebalance(counts)
    assert gather.shape == (2, 6)
    # every new slot copies from the identity primary of its logical expert
    assert (gather < 4).all()  # initial live slots are 0..E-1
    for l in range(2):
        hot = int(np.argmax(counts[l]))
        assert rc[l, hot] == rc[l].max()  # hot expert replicated most


# ----------------------------------------------------------------------
# end-to-end: serving with EPLB on, rebalance mid-stream, exact parity
# ----------------------------------------------------------------------
def _qwen_moe_cfg():
    return transformers.Qwen2MoeConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, shared_expert_intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2, decoder_sparse_step=1,
        mlp_only_layers=[],
    )


def _gen(engine, prompts, n=6):
    outs = engine.generate(
        input_ids=prompts,
        sampling_params={"max_new_tokens": n, "temperature": 0.0,
                         "ignore_eos": True},
    )
    return [o["output_ids"] for o in outs]


def test_qwen_moe_eplb_rebalance_is_numerics_invariant(tmp_path_factory):
    if jax.device_count() < 2:
        pytest.skip("not enough devices")
    torch.manual_seed(0)
    hf = transformers.Qwen2MoeForCausalLM(_qwen_moe_cfg())
    hf.eval()
    d = tmp_path_factory.mktemp("qwen2moe_eplb")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0, tp_size=2, ep_size=2,
        enable_eplb=True, ep_num_redundant_experts=2,
        eplb_rebalance_interval=10**9,  # manual trigger below
    )
    try:
        runner = e.model_runner
        # physical slots = E + redundant, sharded on the expert dim
        eg = runner.params["layers"]["e_gate"]
        assert eg.shape[1] == 6  # 4 experts + 2 redundant slots
        assert runner.params["layers"]["eplb_l2p"].shape == (2, 4, 3)

        rng = np.random.default_rng(0)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (6, 14)]
        ref = []
        for p in prompts:
            with torch.no_grad():
                ref.append(
                    hf.generate(
                        torch.tensor([p]), max_new_tokens=6, do_sample=False
                    )[0][len(p):].tolist()
                )

        before = _gen(e, prompts)
        assert before == ref
        # decode accumulated real routing stats on device
        snap = runner.expert_load_snapshot()
        assert snap is not None and snap.sum() > 0

        assert runner.rebalance_experts() is True
        assert runner.eplb_rebalance_count == 1
        # redundant slots are live now for at least one layer
        rc = np.asarray(runner.params["layers"]["eplb_rc"])
        assert rc.sum() > rc.size  # some expert has >1 replica

        after = _gen(e, prompts)
        assert after == before == ref  # bit-identical across the rebalance

        # a second rebalance from fresh stats also keeps parity
        assert runner.rebalance_experts() is True
        assert _gen(e, prompts) == ref
    finally:
        e.shutdown()


def test_deepseek_eplb_rebalance_parity(tmp_path_factory):
    if jax.device_count() < 2:
        pytest.skip("not enough devices")
    cfg = transformers.DeepseekV2Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        first_k_dense_replace=1, moe_layer_freq=1, routed_scaling_factor=1.0,
        norm_topk_prob=False, topk_method="greedy", n_group=1, topk_group=1,
        kv_lora_rank=32, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, max_position_embeddings=256,
        tie_word_embeddings=False, torch_dtype="float32", eos_token_id=2,
        rope_scaling=None, attention_bias=False,
    )
    torch.manual_seed(0)
    hf = transformers.DeepseekV2ForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("dsv2_eplb")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0, tp_size=2, ep_size=2,
        enable_eplb=True, ep_num_redundant_experts=2,
        eplb_rebalance_interval=10**9,
    )
    try:
        runner = e.model_runner
        # only the single MoE layer (layer 1) carries tables
        assert runner.model.eplb_layer_count() == 1
        rng = np.random.default_rng(3)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (5, 19)]
        ref = []
        for p in prompts:
            with torch.no_grad():
                ref.append(
                    hf.generate(
                        torch.tensor([p]), max_new_tokens=6, do_sample=False
                    )[0][len(p):].tolist()
                )
        assert _gen(e, prompts) == ref
        assert runner.rebalance_experts() is True
        assert _gen(e, prompts) == ref
    finally:
        e.shutdown()


async def test_eplb_http_rpcs(tmp_path_factory, loop):
    """/expert_distribution + /rebalance_experts (scheduler-thread safe)."""
    if jax.device_count() < 2:
        pytest.skip("not enough devices")
    torch.manual_seed(0)
    hf = transformers.Qwen2MoeForCausalLM(_qwen_moe_cfg())
    hf.eval()
    d = tmp_path_factory.mktemp("qwen2moe_eplb_http")
    hf.save_pretrained(d, safe_serialization=True)
    from aiohttp.test_utils import TestClient, TestServer

    from sglang_npu_tpu.entrypoints.http_server import HttpServer

    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0, tp_size=2, ep_size=2,
        enable_eplb=True, ep_num_redundant_experts=2,
        eplb_rebalance_interval=10**9,
    )
    client = TestClient(TestServer(HttpServer(e).build_app()))
    await client.start_server()
    try:
        rng = np.random.default_rng(0)
        prompts = [rng.integers(3, VOCAB, size=8).tolist()]
        _gen(e, prompts)
        resp = await client.get("/expert_distribution")
        assert resp.status == 200
        data = await resp.json()
        assert sum(sum(r) for r in data["counts"]) > 0
        resp = await client.post("/rebalance_experts")
        assert resp.status == 200
        out = await resp.json()
        assert out["success"], out
        # still generates correctly after the RPC-triggered rebalance
        refs = []
        for p in prompts:
            with torch.no_grad():
                refs.append(
                    hf.generate(
                        torch.tensor([p]), max_new_tokens=6, do_sample=False
                    )[0][len(p):].tolist()
                )
        assert _gen(e, prompts) == refs
    finally:
        await client.close()
        e.shutdown()
