"""Hybrid full + sliding-window KV pool (TPU ring design).

Counterpart of the reference's SWA memory stack — `SWAKVPool`
(`srt/mem_cache/memory_pool.py:420`), `SWATokenToKVPoolAllocator`
(`srt/mem_cache/allocator.py:163`) — re-designed for the paged TPU pool:

  * Layers are split into a *full* pool `[L_full, 2, H, NP_full, ps, D]`
    and a *window* pool `[L_swa, 2, H, NP_swa, ps, D]`.
  * Each request owns a fixed **ring** of `NW = ceil(W/ps) + 1` pages in
    the window pool; token position ``p`` lives at ring slot
    ``(p // ps) % NW``.  Out-of-window KV is overwritten in place, so a
    request's window-layer memory is *bounded by the window* for its whole
    lifetime — stronger than the reference, which keeps all SWA KV and
    only reclaims under memory pressure (tombstone eviction in
    `swa_radix_cache.py`).
  * The ring page table is `[B, NW]` (physical page of each ring slot),
    so both HBM *and* attention compute are capped at the window instead
    of the full context.

Write-ordering contract (why extend uses "fed" attention):
  within one jit step all pool writes commit before any read.  An extend
  longer than one page would therefore clobber in-window prefix rows that
  earlier extend tokens still need.  The extend path keeps the new KV
  in-flight (attends [ring prefix | fed extend]) and afterwards writes
  only the rows that survive in the final window — those are < NW*ps
  consecutive positions, hence collision-free.  Decode (E=1) writes
  first: the single overwritten row is out-of-window by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

NEG_INF = -1e9


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HybridKVPool:
    """Full-attention layers' pool + sliding-window layers' ring pool."""

    full: Any  # [L_full, 2, H, NP_full, ps, D]
    swa: Any  # [L_swa, 2, H, NP_swa, ps, D]


def num_ring_pages(window: int, page_size: int) -> int:
    """Pages per request ring: the window plus one page of slack so the
    newest page never lands on a still-needed oldest page."""
    return -(-window // page_size) + 1


def ring_slots(
    swa_page_tables: jax.Array,  # [B, NW] int32
    positions: jax.Array,  # [B, E] int32 absolute positions
    page_size: int,
) -> jax.Array:
    """Token slot ids in the window pool for absolute positions."""
    nw = swa_page_tables.shape[1]
    pg = (positions // page_size) % nw
    ring = jnp.take_along_axis(swa_page_tables, pg, axis=1)
    return ring * page_size + positions % page_size


def _ring_kv_positions(
    seq_lens: jax.Array,  # [B]
    nw: int,
    page_size: int,
):
    """Absolute position of each (ring slot, in-page offset) entry.

    Returns (kv_pos [B, NW*ps] int32, valid [B, NW*ps] bool): ring slot r
    currently holds the newest page whose index ≡ r (mod NW)."""
    cur_page = jnp.maximum(seq_lens - 1, 0) // page_size  # [B]
    r = jnp.arange(nw, dtype=jnp.int32)[None, :]  # [1, NW]
    delta = jnp.mod(cur_page[:, None] - r, nw)
    abs_page = cur_page[:, None] - delta  # [B, NW]
    off = jnp.arange(page_size, dtype=jnp.int32)[None, None, :]
    kv_pos = abs_page[:, :, None] * page_size + off  # [B, NW, ps]
    valid = jnp.broadcast_to(abs_page[:, :, None] >= 0, kv_pos.shape)
    B = kv_pos.shape[0]
    return kv_pos.reshape(B, -1), valid.reshape(B, -1)


def _gather_ring(kv_pool, layer_idx, ring_tables):
    """[B, NW, H, ps, D] K and V pages from the ring."""
    k = kv_pool[layer_idx, 0, :, ring_tables]
    v = kv_pool[layer_idx, 1, :, ring_tables]
    return k, v


def paged_attention_xla_ring(
    q: jax.Array,  # [B, E, H_q, D]
    kv_pool: jax.Array,  # [L_swa, 2, H_kv, NP_swa, ps, D]
    layer_idx: jax.Array,
    ring_tables: jax.Array,  # [B, NW] int32
    seq_lens: jax.Array,  # [B] int32
    q_positions: jax.Array,  # [B, E] int32
    page_size: int,
    scale: float,
    sliding_window: int,
    logit_cap: float = 0.0,
) -> jax.Array:
    """Windowed attention over the ring (KV already written).  Used for
    decode (E=1); ``seq_lens`` must reflect the written content (the
    slot -> absolute-page mapping is derived from it)."""
    B, E, Hq, D = q.shape
    nw = ring_tables.shape[1]
    k, v = _gather_ring(kv_pool, layer_idx, ring_tables)
    Hkv = k.shape[2]
    group = Hq // Hkv
    Lkv = nw * page_size

    qg = q.reshape(B, E, Hkv, group, D)
    scores = (
        jnp.einsum(
            "behgd,bphsd->behgps", qg, k, preferred_element_type=jnp.float32
        ).reshape(B, E, Hkv, group, Lkv)
        * scale
    )
    if logit_cap > 0:
        scores = logit_cap * jnp.tanh(scores / logit_cap)

    kv_pos, valid = _ring_kv_positions(seq_lens, nw, page_size)  # [B, Lkv]
    kv_pos = kv_pos[:, None, :]  # [B, 1, Lkv]
    qp = q_positions[:, :, None]  # [B, E, 1]
    mask = (
        (kv_pos <= qp)
        & (kv_pos < seq_lens[:, None, None])
        & (kv_pos > qp - sliding_window)
        & valid[:, None, :]
    )
    scores = jnp.where(mask[:, :, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "behgps,bphsd->behgd",
        probs.reshape(B, E, Hkv, group, nw, page_size),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, E, Hq, D).astype(q.dtype)


def swa_attention_xla(
    q: jax.Array,  # [B, E, H_q, D]
    new_k: jax.Array,  # [B, E, H_kv, D]
    new_v: jax.Array,
    kv_pool: jax.Array,  # window pool
    layer_idx: jax.Array,
    fb,  # ForwardBatch (swa_page_tables, seq_lens, positions, extend_*)
    page_size: int,
    scale: float,
    sliding_window: int,
    logit_cap: float = 0.0,
):
    """One layer of sliding-window attention against the ring pool.

    Returns (out [B, E, H_q, D], new_pool).  Decode writes-then-attends;
    extend attends [ring prefix | fed new KV] then writes the surviving
    window tail (see module docstring for the ordering argument).
    """
    from sglang_npu_tpu.ops.xla_attention import write_kv

    B, E, Hq, D = q.shape
    rt = fb.swa_page_tables
    nw = rt.shape[1]
    slots = ring_slots(rt, fb.positions, page_size)

    if fb.extend_seq_lens is None:  # decode
        kv_pool = write_kv(kv_pool, layer_idx, new_k, new_v, slots)
        out = paged_attention_xla_ring(
            q, kv_pool, layer_idx, rt, fb.seq_lens, fb.positions,
            page_size, scale, sliding_window, logit_cap,
        )
        return out, kv_pool

    # ---- extend: prefix via ring, current tokens in-flight ----
    Hkv = new_k.shape[2]
    group = Hq // Hkv
    qg = q.reshape(B, E, Hkv, group, D)
    prefix_out_scores_cap = fb.extend_prefix_lens  # [B]

    k, v = _gather_ring(kv_pool, layer_idx, rt)
    Lkv = nw * page_size
    s_ring = (
        jnp.einsum(
            "behgd,bphsd->behgps", qg, k, preferred_element_type=jnp.float32
        ).reshape(B, E, Hkv, group, Lkv)
        * scale
    )
    s_fed = (
        jnp.einsum(
            "bihgd,bjhd->bhgij", qg, new_k.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # [B, Hkv, g, E, E]
    if logit_cap > 0:
        s_ring = logit_cap * jnp.tanh(s_ring / logit_cap)
        s_fed = logit_cap * jnp.tanh(s_fed / logit_cap)

    # slot -> absolute-page mapping from the WRITTEN content: only the
    # prefix is in the ring at gather time (extend rows are fed in-flight)
    kv_pos, valid = _ring_kv_positions(prefix_out_scores_cap, nw, page_size)
    kv_pos = kv_pos[:, None, :]
    qp = fb.positions[:, :, None]  # [B, E, 1]
    ring_mask = (
        (kv_pos < prefix_out_scores_cap[:, None, None])
        & (kv_pos > qp - sliding_window)
        & (kv_pos <= qp)
        & valid[:, None, :]
    )
    s_ring = jnp.where(ring_mask[:, :, None, None, :], s_ring, NEG_INF)

    fed_pos = fb.positions[:, None, :]  # [B, 1(E_q), E_kv] via broadcast
    col_valid = (
        jnp.arange(E, dtype=jnp.int32)[None, :] < fb.extend_seq_lens[:, None]
    )  # [B, E]
    fed_mask = (
        (fed_pos <= qp)
        & (fed_pos > qp - sliding_window)
        & col_valid[:, None, :]
    )  # [B, E, E]
    s_fed = jnp.where(fed_mask[:, None, None, :, :], s_fed, NEG_INF)

    s_all = jnp.concatenate(
        [s_ring.transpose(0, 2, 3, 1, 4), s_fed], axis=-1
    )  # [B, Hkv, g, E, Lkv+E]
    p_all = jax.nn.softmax(s_all, axis=-1).astype(q.dtype)
    p_ring = p_all[..., :Lkv].reshape(B, Hkv, group, E, nw, page_size)
    p_fed = p_all[..., Lkv:]
    out = jnp.einsum(
        "bhgtps,bphsd->bthgd", p_ring, v, preferred_element_type=jnp.float32
    )
    out = out + jnp.einsum(
        "bhgij,bjhd->bihgd", p_fed, new_v.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    out = out.reshape(B, E, Hq, D).astype(q.dtype)

    # write the surviving window tail (positions within NW*ps of the end —
    # distinct ring slots, so scatter order does not matter)
    tail = fb.positions >= (fb.seq_lens[:, None] - nw * page_size)
    eff = jnp.where(tail & col_valid, slots, 0)
    kv_pool = write_kv(kv_pool, layer_idx, new_k, new_v, eff)
    return out, kv_pool
