"""Pure-XLA paged attention (portable fallback backend).

This is the `torch_native_backend.py` analogue of the reference
(`layers/attention/torch_native_backend.py:270`, SDPA fallback): a correct,
device-agnostic attention over the paged KV pool used for CPU CI and as the
numerical reference for the Pallas kernels in `ops/pallas/`.

Unified code path: new-token KV is scattered into the pool *before*
attention, so both extend and decode read everything through the page table.
Decode is just extend with E=1.

KV pool layout (token-major): [L, 2, S, H_kv, D] where S = num_pages *
page_size token slots.  The pool is threaded through the layer scan as a
single carried buffer; reads and writes address it with combined
(layer, k/v, slot) indices so XLA touches only the needed rows instead of
copying per-layer slabs (critical: slab copies scale with pool size, not
batch size).  Slots 0..page_size-1 are the reserved garbage page for padded
writes.

Performance notes (TPU):
  * all matmuls take bf16 inputs with preferred_element_type=f32 — no
    materialized f32 casts of K/V.
  * masks are built from iota comparisons, fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def write_kv(
    kv_pool: jax.Array,  # [L, 2, S, H_kv, D]
    layer_idx: jax.Array,  # scalar int32 (traced)
    new_k: jax.Array,  # [B, E, H_kv, D]
    new_v: jax.Array,
    out_slots: jax.Array,  # [B, E] int32
) -> jax.Array:
    """Scatter new K/V rows into the pool at (layer_idx, {0,1}, slots)."""
    flat_slots = out_slots.reshape(-1)
    nk = new_k.reshape(-1, *new_k.shape[2:]).astype(kv_pool.dtype)
    nv = new_v.reshape(-1, *new_v.shape[2:]).astype(kv_pool.dtype)
    kv_pool = kv_pool.at[layer_idx, 0, flat_slots].set(nk, mode="drop")
    kv_pool = kv_pool.at[layer_idx, 1, flat_slots].set(nv, mode="drop")
    return kv_pool


def paged_attention_xla(
    q: jax.Array,  # [B, E, H_q, D]
    kv_pool: jax.Array,  # [L, 2, S, H_kv, D]
    layer_idx: jax.Array,  # scalar int32 (traced)
    page_tables: jax.Array,  # [B, P] int32
    seq_lens: jax.Array,  # [B] int32 (kv length incl. new tokens)
    q_positions: jax.Array,  # [B, E] int32 absolute positions
    page_size: int,
    scale: float,
    logit_cap: float = 0.0,
    sliding_window: int = -1,
) -> jax.Array:
    """Masked attention of q against the pool KV selected by page_tables.

    Returns [B, E, H_q, D].
    """
    B, E, Hq, D = q.shape
    P = page_tables.shape[1]
    Hkv = kv_pool.shape[3]
    Lkv = P * page_size

    # [B, Lkv] token slot ids
    offs = jnp.arange(page_size, dtype=jnp.int32)
    slot_ids = (page_tables[:, :, None] * page_size + offs[None, None, :]).reshape(
        B, Lkv
    )

    k = kv_pool[layer_idx, 0, slot_ids]  # [B, Lkv, Hkv, D] — row gather only
    v = kv_pool[layer_idx, 1, slot_ids]

    group = Hq // Hkv
    qg = q.reshape(B, E, Hkv, group, D)

    scores = (
        jnp.einsum(
            "behgd,blhd->behgl", qg, k, preferred_element_type=jnp.float32
        )
        * scale
    )  # [B, E, Hkv, group, Lkv] f32

    if logit_cap > 0:
        scores = logit_cap * jnp.tanh(scores / logit_cap)

    kv_pos = jnp.arange(Lkv, dtype=jnp.int32)[None, None, :]  # [1,1,Lkv]
    qp = q_positions[:, :, None]  # [B,E,1]
    mask = (kv_pos <= qp) & (kv_pos < seq_lens[:, None, None])
    if sliding_window > 0:
        mask = mask & (kv_pos > qp - sliding_window)
    scores = jnp.where(mask[:, :, None, None, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "behgl,blhd->behgd", probs, v, preferred_element_type=jnp.float32
    )
    return out.reshape(B, E, Hq, D).astype(q.dtype)
