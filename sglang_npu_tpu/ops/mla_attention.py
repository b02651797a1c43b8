"""MLA latent-KV attention (absorbed matmuls).

Counterpart of the reference's MLA serving path:
`srt/mem_cache/memory_pool.py:708` (`MLATokenToKVPool` — latent kv_lora +
rope buffers) and the absorbed attention in `srt/models/deepseek_v2.py` /
`layers/attention/flashmla_backend.py`.

Per token only the rank-R latent `c_kv` (R = kv_lora_rank) and the shared
rope key `k_pe` are cached — for DeepSeek-V2-Lite that is (512+64) floats
instead of H*(192+192) = 6144: an ~11x KV memory cut.  Attention runs as
MQA with one shared 576-wide key via the absorption identities:

  score_h = q_nope_h . (W_kb_k[h] c_kv) + q_pe_h . k_pe
          = (W_kb_k[h]^T q_nope_h) . c_kv + q_pe_h . k_pe
  out_h   = W_kb_v[h] (sum_t p_t c_kv_t)

so the per-head up-projections move out of the attention inner loop onto
the (small) query side.

Pool layout: ckv [L, NP, ps, R], kpe [L, NP, ps, Rp] with Rp = rope dims
padded to 128 lanes (Pallas-ready split: both trailing dims are 128-
multiples, unlike the fused 576).

Quantized latent KV (``--kv-cache-dtype int8|fp8_e4m3`` on MLA models,
reference `MLATokenToKVPool` fp8 path, `mem_cache/memory_pool.py:708`):
``ckv`` stores int8/f8 rows and the PER-ROW dequant scale rides in the
kpe row's pad lanes (lane ``MLA_SCALE_LANE``) — the rope key keeps bf16
precision (it drives the positional logits and is only 128 of the 640
lanes), every row has an exact scale (no per-page grow-requantization),
and readers get the scale for free with the kpe DMA they already issue.
Latent bytes/row: 512+256 = 768 vs bf16's 1280 (1.67x cut; int8 whole-row
576+... would save 17% more at the cost of rope fidelity + a separate
scale stream)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

NEG_INF = -1e9
KPE_PAD = 128  # rope dims padded to one 128-lane tile
MLA_SCALE_LANE = KPE_PAD - 1  # per-row ckv dequant scale (quantized pools)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MLALatentPool:
    ckv: jax.Array  # [L, NP, ps, R]  bf16 | int8 | f8_e4m3 (see module doc)
    kpe: jax.Array  # [L, NP, ps, KPE_PAD]

    @property
    def quantized(self) -> bool:
        return self.ckv.dtype in (jnp.int8, jnp.float8_e4m3fn)

    @property
    def qmax(self) -> float:
        return 127.0 if self.ckv.dtype == jnp.int8 else 448.0


def quant_latent_rows(ckv_rows: jax.Array, dtype, qmax: float):
    """Quantize latent rows [..., R] -> (q [..., R] dtype, scale [..., 1])."""
    r32 = ckv_rows.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(r32), axis=-1, keepdims=True) / qmax, 1e-8)
    q = r32 / s
    if dtype == jnp.int8:
        q = jnp.clip(jnp.round(q), -127, 127)
    return q.astype(dtype), s


def _dequant_gathered(ckv, kpe_full):
    """Dequant a gathered latent block using the in-row scale lane.
    ckv [..., R] int, kpe_full [..., KPE_PAD] -> ckv f32."""
    s = kpe_full[..., MLA_SCALE_LANE:].astype(jnp.float32)  # [..., 1]
    return ckv.astype(jnp.float32) * s


def write_latent(
    pool: MLALatentPool,
    layer_idx: jax.Array,
    c_kv: jax.Array,  # [B, E, R]
    k_pe: jax.Array,  # [B, E, rope]
    out_slots: jax.Array,  # [B, E]
) -> MLALatentPool:
    ps = pool.ckv.shape[2]
    flat = out_slots.reshape(-1)
    pages = flat // ps
    offs = flat % ps
    rope = k_pe.shape[-1]
    kpe_rows = jnp.pad(
        k_pe.reshape(-1, rope), ((0, 0), (0, KPE_PAD - rope))
    ).astype(pool.kpe.dtype)
    if pool.quantized:
        ckv_rows, s = quant_latent_rows(
            c_kv.reshape(-1, c_kv.shape[-1]), pool.ckv.dtype, pool.qmax
        )
        lane = jnp.arange(KPE_PAD)[None, :] == MLA_SCALE_LANE
        kpe_rows = jnp.where(lane, s.astype(pool.kpe.dtype), kpe_rows)
    else:
        ckv_rows = c_kv.reshape(-1, c_kv.shape[-1]).astype(pool.ckv.dtype)
    ckv = pool.ckv.at[layer_idx, pages, offs].set(ckv_rows, mode="drop")
    kpe = pool.kpe.at[layer_idx, pages, offs].set(kpe_rows, mode="drop")
    return MLALatentPool(ckv=ckv, kpe=kpe)


def tree_verify_mla_attention_xla(
    q_abs: jax.Array,  # [B, T, H, R] absorbed nope queries for the tree
    q_pe: jax.Array,  # [B, T, H, rope]
    ckv_fed: jax.Array,  # [B, T, R] in-flight latents (NOT in the pool)
    kpe_fed: jax.Array,  # [B, T, rope]
    pool: MLALatentPool,
    layer_idx: jax.Array,
    page_tables: jax.Array,  # [B, P]
    prefix_lens: jax.Array,  # [B] committed latent length (root excluded)
    tree_mask: jax.Array,  # [T, T] bool: j is ancestor-or-self of i
    page_size: int,
    scale: float,
) -> jax.Array:
    """Speculative tree-verify against the latent pool (reference
    TARGET_VERIFY mode with MLA, `eagle_utils.py:226` tree masks +
    `flashmla_backend.py` latent attention): each tree node attends the
    committed latent prefix plus its in-flight ancestors; the pool is
    only READ.  Returns the attention-weighted latent context
    [B, T, H, R]."""
    B, T, H, R = q_abs.shape
    P = page_tables.shape[1]
    rope = q_pe.shape[-1]
    Lkv = P * page_size

    ckv = pool.ckv[layer_idx, page_tables]  # [B, P, ps, R]
    kpe_full = pool.kpe[layer_idx, page_tables]
    kpe = kpe_full[..., :rope]
    if pool.quantized:
        ckv = _dequant_gathered(ckv, kpe_full).astype(q_abs.dtype)

    s_pool = (
        jnp.einsum(
            "bthr,bpsr->bthps", q_abs, ckv, preferred_element_type=jnp.float32
        )
        + jnp.einsum(
            "bthr,bpsr->bthps", q_pe, kpe, preferred_element_type=jnp.float32
        )
    ).reshape(B, T, H, Lkv) * scale
    kv_pos = jnp.arange(Lkv, dtype=jnp.int32)[None, None, :]
    pool_mask = kv_pos < prefix_lens[:, None, None]  # [B, 1, Lkv]
    s_pool = jnp.where(pool_mask[:, :, None, :], s_pool, NEG_INF)

    s_fly = (
        jnp.einsum(
            "bihr,bjr->bhij", q_abs, ckv_fed,
            preferred_element_type=jnp.float32,
        )
        + jnp.einsum(
            "bihr,bjr->bhij", q_pe, kpe_fed,
            preferred_element_type=jnp.float32,
        )
    ) * scale  # [B, H, T, T]
    # tree_mask: [T, T] static topology or [B, T, T] data-dependent tree
    mb = tree_mask[None] if tree_mask.ndim == 2 else tree_mask
    s_fly = jnp.where(mb[:, None, :, :], s_fly, NEG_INF)

    # joint softmax over [pool | fed]
    s_all = jnp.concatenate(
        [s_pool.transpose(0, 2, 1, 3), s_fly], axis=-1
    )  # [B, H, T, Lkv+T]
    p_all = jax.nn.softmax(s_all, axis=-1).astype(q_abs.dtype)
    p_pool = p_all[..., :Lkv].reshape(B, H, T, P, page_size)
    p_fly = p_all[..., Lkv:]
    out = jnp.einsum(
        "bhtps,bpsr->bthr", p_pool, ckv, preferred_element_type=jnp.float32
    )
    out = out + jnp.einsum(
        "bhij,bjr->bihr", p_fly, ckv_fed, preferred_element_type=jnp.float32
    )
    return out.astype(q_abs.dtype)


def mla_attention_xla(
    q_abs: jax.Array,  # [B, E, H, R]  (absorbed nope queries)
    q_pe: jax.Array,  # [B, E, H, rope]
    pool: MLALatentPool,
    layer_idx: jax.Array,
    page_tables: jax.Array,  # [B, P]
    seq_lens: jax.Array,  # [B]
    q_positions: jax.Array,  # [B, E]
    page_size: int,
    scale: float,
) -> jax.Array:
    """Returns the attention-weighted latent context [B, E, H, R]."""
    B, E, H, R = q_abs.shape
    P = page_tables.shape[1]
    rope = q_pe.shape[-1]
    Lkv = P * page_size

    ckv = pool.ckv[layer_idx, page_tables]  # [B, P, ps, R]
    kpe_full = pool.kpe[layer_idx, page_tables]
    kpe = kpe_full[..., :rope]  # [B, P, ps, rope]
    if pool.quantized:
        ckv = _dequant_gathered(ckv, kpe_full).astype(q_abs.dtype)

    scores = (
        jnp.einsum(
            "behr,bpsr->behps", q_abs, ckv, preferred_element_type=jnp.float32
        )
        + jnp.einsum(
            "behr,bpsr->behps", q_pe, kpe, preferred_element_type=jnp.float32
        )
    ).reshape(B, E, H, Lkv) * scale

    kv_pos = jnp.arange(Lkv, dtype=jnp.int32)[None, None, :]
    qp = q_positions[:, :, None]
    mask = (kv_pos <= qp) & (kv_pos < seq_lens[:, None, None])
    scores = jnp.where(mask[:, :, None, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1).astype(q_abs.dtype)
    ctx = jnp.einsum(
        "behps,bpsr->behr",
        probs.reshape(B, E, H, P, page_size),
        ckv,
        preferred_element_type=jnp.float32,
    )
    return ctx.astype(q_abs.dtype)
