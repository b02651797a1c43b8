"""Pallas prefill kernel vs XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_npu_tpu.ops.pallas.prefill_kernel import paged_prefill_attention_fused
from sglang_npu_tpu.ops.xla_attention import paged_attention_xla, write_kv

PS = 16


def make_case(B=2, E=64, Hq=8, Hkv=2, D=64, P=16, L=2, prefix_pages=(2, 1), seed=0):
    """Build pool with existing prefix content + new tokens to extend."""
    rng = np.random.default_rng(seed)
    num_pages = P * B + 1
    pool = jnp.asarray(
        rng.standard_normal((L, 2, Hkv, num_pages, PS, D)).astype(np.float32)
    )
    q = jnp.asarray(rng.standard_normal((B, E, Hq, D)).astype(np.float32))
    new_k = jnp.asarray(rng.standard_normal((B, E, Hkv, D)).astype(np.float32))
    new_v = jnp.asarray(rng.standard_normal((B, E, Hkv, D)).astype(np.float32))
    pages = rng.permutation(np.arange(1, num_pages))[: B * P].reshape(B, P)
    prefix_lens = np.array([p * PS for p in prefix_pages], dtype=np.int32)
    extend_lens = np.array([E - 7, E - 13], dtype=np.int32)  # ragged
    seq_lens = prefix_lens + extend_lens
    # positions/out_slots for the XLA reference
    positions = np.zeros((B, E), np.int32)
    out_slots = np.zeros((B, E), np.int32)
    for b in range(B):
        for i in range(E):
            pos = min(prefix_lens[b] + i, P * PS - 1)
            positions[b, i] = prefix_lens[b] + i
            out_slots[b, i] = pages[b][pos // PS] * PS + pos % PS
    return (
        q, new_k, new_v, pool,
        jnp.asarray(pages, jnp.int32),
        jnp.asarray(seq_lens),
        jnp.asarray(prefix_lens),
        jnp.asarray(positions),
        jnp.asarray(out_slots),
        extend_lens,
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_prefill_kernel_matches_xla(seed):
    (q, nk, nv, pool, pages, seq_lens, prefix_lens, positions, out_slots,
     extend_lens) = make_case(seed=seed)
    layer = jnp.int32(1)
    scale = 0.125

    # XLA reference: scatter only the real tokens, rectangle-masked attention
    B, E = q.shape[:2]
    mask_slots = out_slots.copy()
    for b in range(B):
        mask_slots = mask_slots.at[b, extend_lens[b]:].set(0)  # pad writes -> page 0
    pool_ref = write_kv(pool, layer, nk, nv, mask_slots)
    ref = paged_attention_xla(
        q, pool_ref, layer, pages, seq_lens, positions, PS, scale
    )

    out, pool_out = paged_prefill_attention_fused(
        q, nk, nv, pool, layer, pages, seq_lens, prefix_lens,
        page_size=PS, scale=scale, interpret=True,
    )
    for b in range(B):
        n = extend_lens[b]
        np.testing.assert_allclose(
            np.asarray(out)[b, :n], np.asarray(ref)[b, :n], rtol=2e-4, atol=2e-4
        )
    # pool content for real tokens matches the scatter reference
    for b in range(B):
        n = int(extend_lens[b])
        slots = np.asarray(out_slots)[b, :n]
        got_k = np.asarray(pool_out)[1, 0, :, slots // PS, slots % PS]
        want_k = np.asarray(pool_ref)[1, 0, :, slots // PS, slots % PS]
        np.testing.assert_allclose(got_k, want_k, rtol=1e-6, atol=1e-6)


def test_prefill_kernel_unaligned_prefix():
    """Mid-page region start (speculative verify path): RMW + roll write."""
    (q, nk, nv, pool, pages, seq_lens, prefix_lens, positions, out_slots,
     extend_lens) = make_case(seed=11, E=32)
    # force unaligned prefixes
    prefix_np = np.array([5, 9], np.int32)
    extend_np = np.array([29, 23], np.int32)
    B, E = q.shape[:2]
    seq_np = prefix_np + extend_np
    positions = np.zeros((B, E), np.int32)
    out_slots = np.zeros((B, E), np.int32)
    pt_np = np.asarray(pages)
    for b in range(B):
        for i in range(E):
            pos = min(prefix_np[b] + i, pt_np.shape[1] * PS - 1)
            positions[b, i] = prefix_np[b] + i
            out_slots[b, i] = pt_np[b][pos // PS] * PS + pos % PS
    layer = jnp.int32(1)
    scale = 0.125

    mask_slots = out_slots.copy()
    for b in range(B):
        mask_slots[b, extend_np[b]:] = 0
    pool_ref = write_kv(pool, layer, nk, nv, jnp.asarray(mask_slots))
    ref = paged_attention_xla(
        q, pool_ref, layer, pages, jnp.asarray(seq_np),
        jnp.asarray(positions), PS, scale,
    )
    out, pool_out = paged_prefill_attention_fused(
        q, nk, nv, pool, layer, pages, jnp.asarray(seq_np),
        jnp.asarray(prefix_np), page_size=PS, scale=scale, interpret=True,
    )
    for b in range(B):
        n = int(extend_np[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :n], np.asarray(ref)[b, :n], rtol=2e-4, atol=2e-4
        )
        slots = out_slots[b, :n]
        got = np.asarray(pool_out)[1, 0, :, slots // PS, slots % PS]
        want = np.asarray(pool_ref)[1, 0, :, slots // PS, slots % PS]
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_prefill_kernel_reads_prefix():
    """Output must actually attend to pre-existing prefix KV."""
    (q, nk, nv, pool, pages, seq_lens, prefix_lens, positions, out_slots,
     extend_lens) = make_case(seed=3)
    layer = jnp.int32(0)
    out1, _ = paged_prefill_attention_fused(
        q, nk, nv, pool, layer, pages, seq_lens, prefix_lens,
        page_size=PS, scale=0.125, interpret=True,
    )
    # zero the prefix pages -> output should change
    pool_zeroed = pool.at[0, :, :, np.asarray(pages)[0][:2]].set(0.0)
    out2, _ = paged_prefill_attention_fused(
        q, nk, nv, pool_zeroed, layer, pages, seq_lens, prefix_lens,
        page_size=PS, scale=0.125, interpret=True,
    )
    assert not np.allclose(np.asarray(out1)[0, :4], np.asarray(out2)[0, :4])
