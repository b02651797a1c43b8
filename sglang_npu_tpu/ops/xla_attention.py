"""Pure-XLA paged attention (portable fallback backend).

This is the `torch_native_backend.py` analogue of the reference
(`layers/attention/torch_native_backend.py:270`, SDPA fallback): a correct,
device-agnostic attention over the paged KV pool used for CPU CI and as the
numerical reference for the Pallas kernels in `ops/pallas/`.

Unified code path: new-token KV is scattered into the pool *before*
attention, so both extend and decode read everything through the page table.
Decode is just extend with E=1.

KV pool layout (paged, head-major): [L, 2, H_kv, num_pages, page_size, D].
A page is an explicit dimension so the Pallas kernels DMA full trailing
[page_size, D] tiles (Mosaic requires sliced memrefs to keep whole trailing
tiles), and per-(layer, head) pages are contiguous slabs.  The pool is
threaded through the layer scan as a single carried buffer; reads and
writes address it with combined (layer, k/v, page, offset) indices so XLA
touches only the needed rows instead of copying per-layer slabs (critical:
slab copies scale with pool size, not batch size).  Page 0 is the reserved
garbage page for padded writes.

Performance notes (TPU):
  * all matmuls take bf16 inputs with preferred_element_type=f32 — no
    materialized f32 casts of K/V.
  * masks are built from iota comparisons, fused by XLA.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

NEG_INF = -1e9


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantKVPool:
    """Quantized KV pool: int8 (or fp8) data + per-(token, head) scales
    (reference fp8/int8 KV cache, `memory_pool.py set_kv_buffer` scale/cast
    and `layers/quantization/kv_cache.py`)."""

    data: jax.Array  # [L, 2, H, NP, ps, D] int8
    scale: jax.Array  # [L, 2, H, NP, ps] f32


def pool_num_heads(kv_pool) -> int:
    if isinstance(kv_pool, QuantKVPool):
        return kv_pool.data.shape[2]
    return kv_pool.shape[2]


def write_kv(
    kv_pool: jax.Array,  # [L, 2, H_kv, num_pages, ps, D]
    layer_idx: jax.Array,  # scalar int32 (traced)
    new_k: jax.Array,  # [B, E, H_kv, D]
    new_v: jax.Array,
    out_slots: jax.Array,  # [B, E] int32 (token slot = page*ps + off)
) -> jax.Array:
    """Scatter new K/V rows into the pool at (layer, {0,1}, :, page, off).

    Note: layer_idx/pages/offs are advanced indices separated from the `:`
    slice, so result dims come FIRST: the update value has shape [T, H, D].
    """
    if isinstance(kv_pool, QuantKVPool):
        return _write_kv_quant(kv_pool, layer_idx, new_k, new_v, out_slots)
    from sglang_npu_tpu.ops.double_sparse import DoubleSparsePool, ds_write_kv

    if isinstance(kv_pool, DoubleSparsePool):
        return ds_write_kv(kv_pool, layer_idx, new_k, new_v, out_slots)
    ps = kv_pool.shape[4]
    flat_slots = out_slots.reshape(-1)
    pages = flat_slots // ps
    offs = flat_slots % ps
    nk = new_k.reshape(-1, *new_k.shape[2:]).astype(kv_pool.dtype)
    nv = new_v.reshape(-1, *new_v.shape[2:]).astype(kv_pool.dtype)
    kv_pool = kv_pool.at[layer_idx, 0, :, pages, offs].set(nk, mode="drop")
    kv_pool = kv_pool.at[layer_idx, 1, :, pages, offs].set(nv, mode="drop")
    return kv_pool


def _write_kv_quant(
    pool: QuantKVPool, layer_idx, new_k, new_v, out_slots
) -> QuantKVPool:
    """Per-(token, head) symmetric int8 quantization on write."""
    ps = pool.data.shape[4]
    flat_slots = out_slots.reshape(-1)
    pages = flat_slots // ps
    offs = flat_slots % ps
    data, scale = pool.data, pool.scale
    for idx, new in ((0, new_k), (1, new_v)):
        t = new.reshape(-1, *new.shape[2:]).astype(jnp.float32)  # [T, H, D]
        s = jnp.max(jnp.abs(t), axis=-1) / 127.0  # [T, H]
        s = jnp.maximum(s, 1e-8)
        q = jnp.clip(jnp.round(t / s[:, :, None]), -127, 127).astype(jnp.int8)
        data = data.at[layer_idx, idx, :, pages, offs].set(q, mode="drop")
        scale = scale.at[layer_idx, idx, :, pages, offs].set(
            s.astype(jnp.float32), mode="drop"
        )
    return QuantKVPool(data, scale)


def tree_verify_attention_xla(
    q: jax.Array,  # [B, T, H_q, D] queries for the speculation tree
    k_fed: jax.Array,  # [B, T, H_kv, D] in-flight keys (NOT in the pool)
    v_fed: jax.Array,  # [B, T, H_kv, D]
    kv_pool,  # pool holding committed positions 0..prefix-1
    layer_idx: jax.Array,
    page_tables: jax.Array,  # [B, P]
    prefix_lens: jax.Array,  # [B] committed KV length (root excluded)
    tree_mask: jax.Array,  # [T, T] bool: j is ancestor-or-self of i
    page_size: int,
    scale: float,
) -> jax.Array:
    """Speculative tree-verify attention (reference TARGET_VERIFY mode,
    `eagle_utils.py:226` custom tree masks): each tree node attends the
    committed pool prefix plus its in-flight ancestors.  The pool is only
    READ — candidate KV never lands in it (a rejected branch would
    otherwise need rollback copies)."""
    B, T, Hq, D = q.shape
    P = page_tables.shape[1]
    Hkv = k_fed.shape[2]
    group = Hq // Hkv
    Lkv = P * page_size

    if isinstance(kv_pool, QuantKVPool):
        k = kv_pool.data[layer_idx, 0, :, page_tables].astype(jnp.float32)
        v = kv_pool.data[layer_idx, 1, :, page_tables].astype(jnp.float32)
        k = k * kv_pool.scale[layer_idx, 0, :, page_tables][..., None]
        v = v * kv_pool.scale[layer_idx, 1, :, page_tables][..., None]
    else:
        k = kv_pool[layer_idx, 0, :, page_tables]  # [B, P, Hkv, ps, D]
        v = kv_pool[layer_idx, 1, :, page_tables]

    qg = q.reshape(B, T, Hkv, group, D)
    s_pool = (
        jnp.einsum(
            "bthgd,bphsd->bthgps", qg, k, preferred_element_type=jnp.float32
        ).reshape(B, T, Hkv, group, Lkv)
        * scale
    )
    kv_pos = jnp.arange(Lkv, dtype=jnp.int32)[None, None, :]
    pool_mask = kv_pos < prefix_lens[:, None, None]  # [B, 1, Lkv]
    s_pool = jnp.where(pool_mask[:, :, None, None, :], s_pool, NEG_INF)

    s_fly = (
        jnp.einsum(
            "bihgd,bjhd->bhgij",
            qg,
            k_fed,
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # [B, Hkv, group, T, T]
    # tree_mask: [T, T] (static topology) or [B, T, T] (data-dependent
    # top-k tree built on device from parent ranks)
    mb = tree_mask[None] if tree_mask.ndim == 2 else tree_mask
    s_fly = jnp.where(mb[:, None, None, :, :], s_fly, NEG_INF)

    # joint softmax over [pool | fed]
    s_all = jnp.concatenate(
        [
            s_pool.transpose(0, 2, 3, 1, 4),  # [B, Hkv, g, T, Lkv]
            s_fly,
        ],
        axis=-1,
    )
    p_all = jax.nn.softmax(s_all, axis=-1).astype(q.dtype)
    p_pool = p_all[..., :Lkv].reshape(B, Hkv, group, T, P, page_size)
    p_fly = p_all[..., Lkv:]
    out = jnp.einsum(
        "bhgtps,bphsd->bthgd", p_pool, v, preferred_element_type=jnp.float32
    )
    out = out + jnp.einsum(
        "bhgij,bjhd->bihgd", p_fly, v_fed, preferred_element_type=jnp.float32
    )
    return out.reshape(B, T, Hq, D).astype(q.dtype)


def paged_attention_xla(
    q: jax.Array,  # [B, E, H_q, D]
    kv_pool: jax.Array,  # [L, 2, H_kv, S, D]
    layer_idx: jax.Array,  # scalar int32 (traced)
    page_tables: jax.Array,  # [B, P] int32
    seq_lens: jax.Array,  # [B] int32 (kv length incl. new tokens)
    q_positions: jax.Array,  # [B, E] int32 absolute positions
    page_size: int,
    scale: float,
    logit_cap: float = 0.0,
    sliding_window: int = -1,
    sinks=None,  # [H_q] learned sink logits (gpt-oss attention sinks)
    chunk_size: int = 0,  # llama4 chunked attention (aligned local blocks)
    mm_groups=None,  # [B, Lkv] int32 image-group per seq position (-1 text)
    alibi_slopes=None,  # [H_q] ALiBi slopes (baichuan-13B class)
) -> jax.Array:
    """Masked attention of q against the pool KV selected by page_tables.

    With ``sinks``, the softmax denominator includes a per-head learned
    sink logit (gpt-oss: softmax over [scores | sink], sink column
    dropped) — attention can "abstain" by dumping mass on the sink.

    With ``mm_groups``, query/key pairs inside the SAME image block attend
    bidirectionally, overriding the causal/sliding masks (gemma3
    multimodal semantics; reference `srt/models/gemma3_mm.py:249`, HF
    `token_type_ids_mask_function`).

    Returns [B, E, H_q, D].
    """
    B, E, Hq, D = q.shape
    from sglang_npu_tpu.ops.double_sparse import (
        DoubleSparsePool,
        ds_decode_attention_xla,
    )

    if isinstance(kv_pool, DoubleSparsePool):
        if (
            E == 1
            and sliding_window <= 0
            and logit_cap <= 0
            and sinks is None
            and chunk_size <= 0
            and mm_groups is None
        ):
            from sglang_npu_tpu.ops.double_sparse import DS_TOKEN_K

            return ds_decode_attention_xla(
                q, kv_pool, layer_idx, page_tables, seq_lens,
                page_size, scale, DS_TOKEN_K[0],
            )
        # extend / feature-heavy paths run dense over the data buffer
        kv_pool = kv_pool.data
    P = page_tables.shape[1]
    Hkv = pool_num_heads(kv_pool)
    Lkv = P * page_size

    # advanced indices (layer_idx 0-d, page_tables [B, P]) around the `:`
    # slice -> result dims first: [B, P, Hkv, ps, D]; page gather only.
    if isinstance(kv_pool, QuantKVPool):
        k = kv_pool.data[layer_idx, 0, :, page_tables].astype(jnp.float32)
        v = kv_pool.data[layer_idx, 1, :, page_tables].astype(jnp.float32)
        ks = kv_pool.scale[layer_idx, 0, :, page_tables]  # [B, P, H, ps]
        vs = kv_pool.scale[layer_idx, 1, :, page_tables]
        k = k * ks[..., None]
        v = v * vs[..., None]
    else:
        k = kv_pool[layer_idx, 0, :, page_tables]
        v = kv_pool[layer_idx, 1, :, page_tables]

    group = Hq // Hkv
    qg = q.reshape(B, E, Hkv, group, D)

    scores = (
        jnp.einsum(
            "behgd,bphsd->behgps", qg, k, preferred_element_type=jnp.float32
        ).reshape(B, E, Hkv, group, Lkv)
        * scale
    )  # [B, E, Hkv, group, Lkv] f32

    if logit_cap > 0:
        scores = logit_cap * jnp.tanh(scores / logit_cap)

    kv_pos = jnp.arange(Lkv, dtype=jnp.int32)[None, None, :]  # [1,1,Lkv]
    if alibi_slopes is not None:
        # ALiBi: score += slope_h * (kv_pos - q_pos)  (<= 0 on the past)
        dist = (kv_pos - q_positions[:, :, None]).astype(jnp.float32)
        sl = alibi_slopes.reshape(1, 1, Hkv, group, 1)
        scores = scores + sl * dist[:, :, None, None, :]
    qp = q_positions[:, :, None]  # [B,E,1]
    mask = (kv_pos <= qp) & (kv_pos < seq_lens[:, None, None])
    if isinstance(sliding_window, (int, float)):
        if sliding_window > 0:
            mask = mask & (kv_pos > qp - sliding_window)
    else:
        # traced per-layer window (e.g. Gemma-2 alternating layers)
        mask = mask & (kv_pos > qp - sliding_window)
    if chunk_size:
        # llama4 chunked attention: query at position p attends only
        # within its aligned chunk [floor(p/C)*C, p]
        mask = mask & (kv_pos >= (qp // chunk_size) * chunk_size)
    if mm_groups is not None:
        # same-image bidirectional override (still bounded by seq_lens)
        qg = jnp.take_along_axis(mm_groups, q_positions, axis=1)  # [B, E]
        bidir = (
            (qg[:, :, None] >= 0)
            & (qg[:, :, None] == mm_groups[:, None, :])
            & (kv_pos < seq_lens[:, None, None])
        )
        mask = mask | bidir
    scores = jnp.where(mask[:, :, None, None, :], scores, NEG_INF)

    if sinks is not None:
        s = sinks.astype(jnp.float32).reshape(1, 1, Hkv, group, 1)
        m = jnp.maximum(scores.max(axis=-1, keepdims=True), s)
        p = jnp.exp(scores - m)
        denom = p.sum(axis=-1, keepdims=True) + jnp.exp(s - m)
        probs = (p / denom).astype(q.dtype)
    else:
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "behgps,bphsd->behgd",
        probs.reshape(B, E, Hkv, group, P, page_size),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, E, Hq, D).astype(q.dtype)
