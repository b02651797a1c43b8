"""Expert parallelism (EP) correctness on the virtual CPU mesh.

Reference behaviors: `srt/layers/moe/ep_moe/layer.py` + the DeepEP token
dispatcher — here realized TPU-natively as expert-dim weight sharding
with a shard_map local-experts compute + psum combine
(`layers/moe.moe_mlp_ep`).  EP runs must produce exactly the single-chip
greedy outputs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


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


def _check(engine, hf, prompts, n=6):
    outs = engine.generate(
        input_ids=prompts,
        sampling_params={"max_new_tokens": n, "temperature": 0.0,
                         "ignore_eos": True},
    )
    for p, o in zip(prompts, outs):
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([p]), max_new_tokens=n, do_sample=False
            )[0][len(p):].tolist()
        assert o["output_ids"] == ref, f"got {o['output_ids']} want {ref}"


@pytest.mark.parametrize("ep", [2, 4])
@pytest.mark.parametrize("dispatch", ["replicated", "a2a"])
def test_qwen_moe_ep_matches_hf(tmp_path_factory, ep, dispatch):
    if jax.device_count() < ep:
        pytest.skip("not enough devices")
    torch.manual_seed(0)
    hf = transformers.Qwen2MoeForCausalLM(_qwen_moe_cfg())
    hf.eval()
    d = tmp_path_factory.mktemp(f"qwen2moe_ep{ep}_{dispatch}")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0, tp_size=ep, ep_size=ep, ep_dispatch=dispatch,
    )
    try:
        assert e.model_runner.model.ep_size == ep
        # expert weights sharded on the EXPERT dim across ep devices
        eg = e.model_runner.params["layers"]["e_gate"]
        assert len(eg.sharding.device_set) == ep
        spec = eg.sharding.spec
        assert spec[1] == "model" and spec[3] is None, spec
        rng = np.random.default_rng(0)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (6, 14, 25)]
        _check(e, hf, prompts)
    finally:
        e.shutdown()


def test_deepseek_moe_ep_matches_hf(tmp_path_factory):
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
    d = tmp_path_factory.mktemp("dsv2_ep")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0, tp_size=2, ep_size=2,
    )
    try:
        rng = np.random.default_rng(3)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (5, 19)]
        _check(e, hf, prompts)
    finally:
        e.shutdown()


def test_ep_requires_moe_and_divisibility(tmp_path_factory):
    if jax.device_count() < 2:
        pytest.skip("not enough devices")
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, torch_dtype="float32",
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("dense_ep")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    with pytest.raises(Exception, match="MoE"):
        Engine(
            model_path=str(d), dtype="float32", skip_tokenizer_init=True,
            page_size=4, max_total_tokens=1024, attention_backend="xla",
            random_seed=0, tp_size=2, ep_size=2,
        )


def test_a2a_dispatch_matches_replicated_with_eplb_tables():
    """moe_mlp_ep_a2a (token-sharded all-to-all dispatch, reference
    deepep normal mode) computes the same result as the replicated-token
    design, including EPLB redundant-replica tables and routing stats."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from sglang_npu_tpu.layers.moe import moe_mlp_ep, moe_mlp_ep_a2a

    ep = 4
    if jax.device_count() < ep:
        pytest.skip("not enough devices")
    mesh = Mesh(np.asarray(jax.devices()[:ep]).reshape(1, ep), ("data", "model"))
    rng = np.random.default_rng(0)
    T, Dm, F, E, R, K = 13, 32, 16, 6, 2, 2
    P_slots = 8  # 6 logical + 2 redundant
    x = jnp.asarray(rng.standard_normal((T, Dm)).astype(np.float32))
    router = jnp.asarray(rng.standard_normal((Dm, E)).astype(np.float32))
    wg = rng.standard_normal((P_slots, Dm, F)).astype(np.float32)
    wu = rng.standard_normal((P_slots, Dm, F)).astype(np.float32)
    wd = rng.standard_normal((P_slots, F, Dm)).astype(np.float32)
    # replicas: logical expert 0 lives at slots 0 and 6 (same weights)
    wg[6], wu[6], wd[6] = wg[0], wu[0], wd[0]
    wg[7], wu[7], wd[7] = wg[1], wu[1], wd[1]
    l2p = jnp.asarray(
        np.array([[0, 6], [1, 7], [2, 2], [3, 3], [4, 4], [5, 5]], np.int32)
    )
    rc = jnp.asarray(np.array([2, 2, 1, 1, 1, 1], np.int32))
    smask = jnp.ones((T,), bool)
    kw = dict(
        top_k=K, norm_topk_prob=True, mesh=mesh, axis="model",
        l2p=l2p, rc=rc, collect_stats=True, stats_mask=smask,
    )
    ref, ref_stats = moe_mlp_ep(
        x, router, jnp.asarray(wg), jnp.asarray(wu), jnp.asarray(wd), **kw
    )
    got, got_stats = moe_mlp_ep_a2a(
        x, router, jnp.asarray(wg), jnp.asarray(wu), jnp.asarray(wd), **kw
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(got_stats), np.asarray(ref_stats))
