"""Pallas decode kernel vs XLA reference attention (interpret mode on CPU —
the reference's sgl-kernel unit-test pattern, `sgl-kernel/tests/`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_npu_tpu.ops.pallas.decode_kernel import paged_decode_attention
from sglang_npu_tpu.ops.xla_attention import paged_attention_xla


def make_case(B=3, Hq=8, Hkv=2, D=64, ps=16, P=8, L=2, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    num_pages = P * B + 1
    pool = rng.standard_normal((L, 2, Hkv, num_pages, ps, D)).astype(np.float32)
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    # distinct random pages per request (page 0 reserved)
    pages = rng.permutation(np.arange(1, B * P + 1))[: B * P].reshape(B, P)
    seq_lens = rng.integers(1, P * ps, size=B).astype(np.int32)
    return (
        jnp.asarray(q, dtype),
        jnp.asarray(pool, dtype),
        jnp.asarray(pages, jnp.int32),
        jnp.asarray(seq_lens),
    )


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("ps", [16, 8])
def test_decode_kernel_matches_xla(seed, ps):
    q, pool, pages, seq_lens = make_case(seed=seed, ps=ps)
    scale = 0.125
    layer = jnp.int32(1)
    out_k = paged_decode_attention(
        q, pool, layer, pages, seq_lens, page_size=ps, scale=scale, interpret=True
    )
    ref = paged_attention_xla(
        q[:, None],
        pool,
        layer,
        pages,
        seq_lens,
        (seq_lens - 1)[:, None],
        ps,
        scale,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_decode_kernel_sliding_window():
    q, pool, pages, seq_lens = make_case(seed=2)
    layer = jnp.int32(0)
    win = 24
    out_k = paged_decode_attention(
        q, pool, layer, pages, seq_lens, page_size=16, scale=0.125,
        sliding_window=win, interpret=True,
    )
    ref = paged_attention_xla(
        q[:, None], pool, layer, pages, seq_lens, (seq_lens - 1)[:, None],
        16, 0.125, sliding_window=win,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_decode_kernel_logit_cap():
    q, pool, pages, seq_lens = make_case(seed=3)
    layer = jnp.int32(0)
    out_k = paged_decode_attention(
        q, pool, layer, pages, seq_lens, page_size=16, scale=0.125,
        logit_cap=30.0, interpret=True,
    )
    ref = paged_attention_xla(
        q[:, None], pool, layer, pages, seq_lens, (seq_lens - 1)[:, None],
        16, 0.125, logit_cap=30.0,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_write_attention_matches_xla():
    import jax

    from sglang_npu_tpu.ops.pallas.decode_kernel import paged_decode_attention_fused
    from sglang_npu_tpu.ops.xla_attention import write_kv

    q, pool, pages, seq_lens = make_case(seed=7)
    rng = np.random.default_rng(7)
    B, Hq, D = q.shape
    Hkv = pool.shape[2]
    new_k = jnp.asarray(rng.standard_normal((B, Hkv, D)).astype(np.float32))
    new_v = jnp.asarray(rng.standard_normal((B, Hkv, D)).astype(np.float32))
    layer = jnp.int32(1)
    ps = 16
    # the new token sits at position seq_len-1 -> slot from the page table
    pos = np.asarray(seq_lens) - 1
    pt_np = np.asarray(pages)
    slots = pt_np[np.arange(B), pos // ps] * ps + pos % ps
    slots = jnp.asarray(slots[:, None], jnp.int32)

    # XLA reference: scatter then attend
    pool_ref = write_kv(pool, layer, new_k[:, None], new_v[:, None], slots)
    ref = paged_attention_xla(
        q[:, None], pool_ref, layer, pages, seq_lens,
        (seq_lens - 1)[:, None], ps, 0.125,
    )[:, 0]

    out, pool_out = paged_decode_attention_fused(
        q, new_k, new_v, pool, layer, pages, seq_lens,
        page_size=ps, scale=0.125, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
    # pool updated identically
    np.testing.assert_allclose(
        np.asarray(pool_out), np.asarray(pool_ref), rtol=1e-6, atol=1e-6
    )


def test_decode_kernel_padded_rows():
    q, pool, pages, seq_lens = make_case(seed=4)
    # row 0 padded: seq_len 0 must not crash (output garbage is discarded)
    seq_lens = seq_lens.at[0].set(0)
    layer = jnp.int32(0)
    out = paged_decode_attention(
        q, pool, layer, pages, seq_lens, page_size=16, scale=0.125, interpret=True
    )
    assert np.all(np.isfinite(np.asarray(out[1:])))
