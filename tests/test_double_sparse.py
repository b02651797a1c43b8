"""Double-sparsity sparse decode (reference double_sparsity_backend.py +
DoubleSparseTokenToKVPool): label cache + top-k token selection + exact
attention over the selected rows."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=1024, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(cfg)
    d = tmp_path_factory.mktemp("ds_model")
    m.save_pretrained(d, safe_serialization=True)
    return str(d), m


def test_ds_exact_when_topk_covers_context(model_dir):
    """token_k >= seq: the sparse path must reproduce dense attention
    exactly (the selection keeps every valid token)."""
    path, hf = model_dir
    e = Engine(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=8192, random_seed=0,
        attention_backend="double_sparse", ds_token_num=512,
        ds_heavy_channel_num=8,
    )
    try:
        from sglang_npu_tpu.ops.double_sparse import DoubleSparsePool

        assert isinstance(e.model_runner.kv_pool, DoubleSparsePool)
        rng = np.random.default_rng(0)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (6, 19)]
        outs = e.generate(
            input_ids=prompts,
            sampling_params={
                "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True
            },
        )
        for p, o in zip(prompts, outs):
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([p]), max_new_tokens=8, do_sample=False
                )[0][len(p):].tolist()
            assert o["output_ids"] == ref, (o["output_ids"], ref)
    finally:
        e.shutdown()


def test_ds_sparse_selection_approximates(model_dir):
    """token_k < seq: generation still runs, stays in-vocab, and the label
    scores pick the true heavy tokens on planted data (op-level check)."""
    from sglang_npu_tpu.ops.double_sparse import (
        DoubleSparsePool,
        ds_decode_attention_xla,
        ds_write_kv,
    )

    # op-level: plant one high-similarity token; the sparse path with
    # token_k=4 must weight it like dense attention does
    L, H, NP, ps, D, r = 1, 2, 8, 4, 16, 4
    rng = np.random.default_rng(1)
    pool = DoubleSparsePool(
        data=jnp.zeros((L, 2, H, NP, ps, D), jnp.float32),
        labels=jnp.zeros((L, H, NP, ps, r), jnp.float32),
        channels=jnp.asarray(
            np.tile(np.arange(r, dtype=np.int32), (L, H, 1))
        ),
    )
    T = 24
    ks = rng.standard_normal((1, T, H, D)).astype(np.float32) * 0.1
    q = rng.standard_normal((1, 1, H, D)).astype(np.float32)
    ks[0, 17] = np.asarray(q[0, 0]) * 3.0  # heavy token, big label overlap
    vs = rng.standard_normal((1, T, H, D)).astype(np.float32)
    slots = np.arange(T, dtype=np.int32)[None]
    pool = ds_write_kv(
        pool, jnp.int32(0), jnp.asarray(ks), jnp.asarray(vs),
        jnp.asarray(slots),
    )
    pt = jnp.asarray(np.arange(6, dtype=np.int32)[None])
    sl = jnp.asarray(np.array([T], np.int32))
    sparse = ds_decode_attention_xla(
        jnp.asarray(q), pool, jnp.int32(0), pt, sl, ps, 0.25, token_k=4
    )
    dense = ds_decode_attention_xla(
        jnp.asarray(q), pool, jnp.int32(0), pt, sl, ps, 0.25, token_k=T
    )
    # the heavy token dominates both; sparse ~ dense
    np.testing.assert_allclose(
        np.asarray(sparse), np.asarray(dense), rtol=0.15, atol=0.15
    )

    # engine-level smoke with real sparsity
    path, _ = model_dir
    e = Engine(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=8192, random_seed=0,
        attention_backend="double_sparse", ds_token_num=8,
    )
    try:
        out = e.generate(
            input_ids=np.random.default_rng(2).integers(3, VOCAB, 120).tolist(),
            sampling_params={
                "max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True
            },
        )
        assert len(out["output_ids"]) == 6
        assert all(0 <= t < VOCAB for t in out["output_ids"])
    finally:
        e.shutdown()
