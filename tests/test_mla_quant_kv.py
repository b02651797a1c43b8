"""Quantized MLA latent KV (int8/fp8 ckv + per-row scale in the kpe pad
lane — reference `MLATokenToKVPool` fp8, `mem_cache/memory_pool.py:708`):

  * write_latent/mla_attention_xla round-trip accuracy vs the bf16 pool
  * the fused Pallas decode kernel (interpret) matches the XLA quantized
    reference exactly (same quantized values, same scales)
  * eagle latent commit path quantizes accepted rows
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sglang_npu_tpu.ops.mla_attention import (
    KPE_PAD,
    MLA_SCALE_LANE,
    MLALatentPool,
    mla_attention_xla,
    tree_verify_mla_attention_xla,
    write_latent,
)
from sglang_npu_tpu.ops.pallas.mla_decode_kernel import mla_paged_decode_fused


def _mk_pool(L, NP, ps, R, dtype):
    kpe_dt = jnp.bfloat16 if dtype in (jnp.int8, jnp.float8_e4m3fn) else dtype
    return MLALatentPool(
        ckv=jnp.zeros((L, NP, ps, R), dtype),
        kpe=jnp.zeros((L, NP, ps, KPE_PAD), kpe_dt),
    )


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn])
def test_quant_latent_write_read_accuracy(dtype):
    rng = np.random.default_rng(0)
    L, NP, ps, R, rope = 2, 6, 8, 256, 64
    n = 20
    pool_q = _mk_pool(L, NP, ps, R, dtype)
    pool_f = _mk_pool(L, NP, ps, R, jnp.float32)
    ckv = rng.standard_normal((1, n, R)).astype(np.float32)
    kpe = rng.standard_normal((1, n, rope)).astype(np.float32)
    slots = np.arange(n, dtype=np.int32)[None]
    pool_q = write_latent(
        pool_q, jnp.int32(1), jnp.asarray(ckv), jnp.asarray(kpe),
        jnp.asarray(slots),
    )
    pool_f = write_latent(
        pool_f, jnp.int32(1), jnp.asarray(ckv), jnp.asarray(kpe),
        jnp.asarray(slots),
    )
    assert pool_q.quantized and not pool_f.quantized
    # dequantized rows close to the originals
    scale = np.asarray(
        pool_q.kpe[1].reshape(-1, KPE_PAD)[:n, MLA_SCALE_LANE], np.float32
    )
    rows = np.asarray(pool_q.ckv[1].reshape(-1, R)[:n], np.float32)
    deq = rows * scale[:, None]
    tol = 1.2e-2 if dtype == jnp.int8 else 8e-2
    assert np.max(np.abs(deq - ckv[0])) <= tol * np.abs(ckv).max()

    # attention over the quantized pool tracks the f32 pool
    B, H = 2, 4
    pt = np.array([[0, 1], [1, 2]], np.int32)
    seq_lens = np.array([9, 4], np.int32)
    q_abs = jnp.asarray(rng.standard_normal((B, 1, H, R)).astype(np.float32))
    q_pe = jnp.asarray(rng.standard_normal((B, 1, H, rope)).astype(np.float32))
    pos = jnp.asarray((seq_lens - 1)[:, None])
    args = (jnp.int32(1), jnp.asarray(pt), jnp.asarray(seq_lens), pos, ps, 0.1)
    out_q = mla_attention_xla(q_abs, q_pe, pool_q, *args)
    out_f = mla_attention_xla(q_abs, q_pe, pool_f, *args)
    # e4m3 keeps 3 mantissa bits (~6% per element); int8 ~0.4%
    a = 0.05 if dtype == jnp.int8 else 0.3
    np.testing.assert_allclose(
        np.asarray(out_q, np.float32), np.asarray(out_f, np.float32),
        atol=a, rtol=a,
    )


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn])
def test_quant_mla_pallas_matches_xla(dtype):
    """Fused kernel vs scatter+gather over the SAME quantized pool: both
    quantize identically, so outputs must match to f32 tolerance."""
    rng = np.random.default_rng(1)
    L, ps, R, rope, H = 2, 8, 256, 64, 4
    seqs = [1, 5, 17]
    B = len(seqs)
    layer = 1
    max_pages = max(-(-s // ps) for s in seqs) + 1
    NP = B * max_pages + 1
    pool = _mk_pool(L, NP, ps, R, dtype)
    page_tables = np.zeros((B, max_pages), np.int32)
    for i in range(B):
        page_tables[i] = 1 + i * max_pages + np.arange(max_pages)
    seq_lens = np.asarray(seqs, np.int32)

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

    q_abs = jnp.asarray(
        rng.standard_normal((B, H, R)).astype(np.float32), jnp.bfloat16
    )
    q_pe = jnp.asarray(
        rng.standard_normal((B, H, rope)).astype(np.float32), jnp.bfloat16
    )
    new_ckv = jnp.asarray(
        rng.standard_normal((B, R)).astype(np.float32), jnp.bfloat16
    )
    new_kpe = jnp.asarray(
        rng.standard_normal((B, rope)).astype(np.float32), jnp.bfloat16
    )
    scale = 0.125

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
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )
    # the kernel's in-place write must equal the scatter write: same
    # quantized row and same scale lane
    pos0 = seqs[0] - 1
    pg, off = page_tables[0][pos0 // ps], pos0 % ps
    np.testing.assert_array_equal(
        np.asarray(got_pool.ckv[layer, pg, off], np.float32),
        np.asarray(ref_pool.ckv[layer, pg, off], np.float32),
    )
    np.testing.assert_allclose(
        np.asarray(got_pool.kpe[layer, pg, off], np.float32),
        np.asarray(ref_pool.kpe[layer, pg, off], np.float32),
        rtol=1e-2, atol=1e-3,
    )


def test_quant_tree_verify_tracks_f32():
    rng = np.random.default_rng(2)
    L, NP, ps, R, rope, H, T = 2, 6, 8, 256, 64, 2, 3
    B = 1
    pool_q = _mk_pool(L, NP, ps, R, jnp.int8)
    pool_f = _mk_pool(L, NP, ps, R, jnp.float32)
    n = 10
    ckv = rng.standard_normal((1, n, R)).astype(np.float32)
    kpe = rng.standard_normal((1, n, rope)).astype(np.float32)
    slots = np.arange(n, dtype=np.int32)[None]
    for p in ("q", "f"):
        pass
    pool_q = write_latent(pool_q, jnp.int32(0), jnp.asarray(ckv),
                          jnp.asarray(kpe), jnp.asarray(slots))
    pool_f = write_latent(pool_f, jnp.int32(0), jnp.asarray(ckv),
                          jnp.asarray(kpe), jnp.asarray(slots))
    q_abs = jnp.asarray(rng.standard_normal((B, T, H, R)), jnp.float32)
    q_pe = jnp.asarray(rng.standard_normal((B, T, H, rope)), jnp.float32)
    ckv_fed = jnp.asarray(rng.standard_normal((B, T, R)), jnp.float32)
    kpe_fed = jnp.asarray(rng.standard_normal((B, T, rope)), jnp.float32)
    tree = jnp.asarray(np.tril(np.ones((T, T), bool)))
    pt = jnp.asarray(np.arange(2, dtype=np.int32)[None])
    plen = jnp.asarray([n], jnp.int32)
    o_q = tree_verify_mla_attention_xla(
        q_abs, q_pe, ckv_fed, kpe_fed, pool_q, jnp.int32(0), pt, plen,
        tree, ps, 0.1,
    )
    o_f = tree_verify_mla_attention_xla(
        q_abs, q_pe, ckv_fed, kpe_fed, pool_f, jnp.int32(0), pt, plen,
        tree, ps, 0.1,
    )
    np.testing.assert_allclose(
        np.asarray(o_q, np.float32), np.asarray(o_f, np.float32),
        atol=0.05, rtol=0.05,
    )
