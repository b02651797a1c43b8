"""Pallas MLA decode kernel vs the XLA latent-attention reference
(reference MLA kernels: flashmla_backend.py:541 / ascend MLA path):
fused in-kernel latent write + flash attention must match
write_latent + mla_attention_xla bit-for-bit-ish in f32."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sglang_npu_tpu.ops.mla_attention import (
    KPE_PAD,
    MLALatentPool,
    mla_attention_xla,
    write_latent,
)
from sglang_npu_tpu.ops.pallas.mla_decode_kernel import mla_paged_decode_fused


@pytest.mark.parametrize("seqs", [[1, 5, 33], [17, 64]])
def test_mla_decode_kernel_matches_xla(seqs):
    rng = np.random.default_rng(0)
    L, ps, R, rope, H = 2, 8, 256, 64, 4
    B = len(seqs)
    layer = 1
    max_pages = max(-(-s // ps) for s in seqs) + 1
    NP = B * max_pages + 1
    pool = MLALatentPool(
        ckv=jnp.zeros((L, NP, ps, R), jnp.float32),
        kpe=jnp.zeros((L, NP, ps, KPE_PAD), jnp.float32),
    )
    page_tables = np.zeros((B, max_pages), np.int32)
    for i in range(B):
        page_tables[i] = 1 + i * max_pages + np.arange(max_pages)
    seq_lens = np.asarray(seqs, np.int32)

    # backfill the prefix latents (positions < seq_len-1) via write_latent
    for i, s in enumerate(seqs):
        if s <= 1:
            continue
        n = s - 1
        ckv_rows = rng.standard_normal((1, n, R)).astype(np.float32)
        kpe_rows = rng.standard_normal((1, n, rope)).astype(np.float32)
        slots = (
            page_tables[i][np.arange(n) // ps] * ps + np.arange(n) % ps
        )[None]
        pool = write_latent(
            pool, jnp.int32(layer), jnp.asarray(ckv_rows),
            jnp.asarray(kpe_rows), jnp.asarray(slots),
        )

    q_abs = jnp.asarray(rng.standard_normal((B, H, R)).astype(np.float32))
    q_pe = jnp.asarray(rng.standard_normal((B, H, rope)).astype(np.float32))
    new_ckv = jnp.asarray(rng.standard_normal((B, R)).astype(np.float32))
    new_kpe = jnp.asarray(rng.standard_normal((B, rope)).astype(np.float32))
    scale = 0.125

    # reference: scatter-write then XLA gather attention
    cur_slots = np.array(
        [
            page_tables[i][(s - 1) // ps] * ps + (s - 1) % ps
            for i, s in enumerate(seqs)
        ],
        np.int32,
    )[:, None]
    ref_pool = write_latent(
        pool, jnp.int32(layer), new_ckv[:, None], new_kpe[:, None],
        jnp.asarray(cur_slots),
    )
    ref = mla_attention_xla(
        q_abs[:, None], q_pe[:, None], ref_pool, jnp.int32(layer),
        jnp.asarray(page_tables), jnp.asarray(seq_lens),
        jnp.asarray(seq_lens - 1)[:, None], ps, scale,
    )[:, 0]

    got, got_pool = mla_paged_decode_fused(
        q_abs, q_pe, new_ckv, new_kpe, pool, jnp.int32(layer),
        jnp.asarray(page_tables), jnp.asarray(seq_lens), ps, scale,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # the fused write landed the same latent rows
    np.testing.assert_allclose(
        np.asarray(got_pool.ckv), np.asarray(ref_pool.ckv), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_pool.kpe), np.asarray(ref_pool.kpe), rtol=1e-6, atol=1e-6
    )


def test_deepseek_engine_uses_pallas_flag_off_on_cpu():
    """On CPU the runner must keep the XLA MLA path (kernel is chip-only)."""
    import tempfile, json, os

    from sglang_npu_tpu.entrypoints.engine import Engine

    cfg = {
        "architectures": ["DeepseekV2ForCausalLM"],
        "model_type": "deepseek_v2",
        "vocab_size": 128,
        "hidden_size": 64,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 4,
        "intermediate_size": 128,
        "moe_intermediate_size": 64,
        "n_routed_experts": 4,
        "n_shared_experts": 1,
        "num_experts_per_tok": 2,
        "first_k_dense_replace": 1,
        "moe_layer_freq": 1,
        "kv_lora_rank": 256,
        "q_lora_rank": None,
        "qk_nope_head_dim": 32,
        "qk_rope_head_dim": 16,
        "v_head_dim": 32,
        "routed_scaling_factor": 1.0,
        "topk_method": "greedy",
        "n_group": 1,
        "topk_group": 1,
        "norm_topk_prob": False,
        "rms_norm_eps": 1e-6,
        "max_position_embeddings": 512,
        "torch_dtype": "float32",
    }
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    e = Engine(
        model_path=d, load_format="dummy", dtype="float32",
        skip_tokenizer_init=True, page_size=4, max_total_tokens=2048,
        random_seed=0,
    )
    try:
        assert e.model_runner.attention_backend_name == "mla"
        assert not getattr(e.model_runner.model, "use_pallas_mla", False)
        out = e.generate(
            input_ids=[3, 5, 7],
            sampling_params={
                "max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True
            },
        )
        assert len(out["output_ids"]) == 4
    finally:
        e.shutdown()
