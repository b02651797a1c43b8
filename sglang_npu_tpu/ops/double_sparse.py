"""Double-sparsity sparse decode (reference
`layers/attention/double_sparsity_backend.py:257` +
`mem_cache/memory_pool.py:1009` DoubleSparseTokenToKVPool).

Long-context decode accelerator: alongside each K row the pool stores a
tiny per-head LABEL — K restricted to ``r`` "heavy" channels.  Decode
first scores the query against the label cache (r floats/token instead
of D), takes the top ``token_k`` tokens, and runs exact attention over
only those rows.  HBM traffic per step drops from seq*D to
seq*r + token_k*D — the win at long sequences.

TPU shape discipline: ``token_k`` is a static bucket, top_k/gather are
XLA-native, and the label buffer lives next to the pool so the page
table indexes both.  Heavy channels are per (layer, kv-head), taken from
a calibration file (reference ``ds_channel_config``) or derived at load
time from the K-projection's output-channel norms.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

NEG_INF = -1e9

# module knob set by the ModelRunner from --ds-token-num (a static top-k
# bucket; values are read at trace time)
DS_TOKEN_K = [256]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DoubleSparsePool:
    """bf16 KV pool + heavy-channel label cache.

    data     [L, 2, H, NP, ps, D]
    labels   [L, H, NP, ps, r]    (K heavy channels, write-through)
    channels [L, H, r] int32      (static per-layer/head heavy channels)
    """

    data: jax.Array
    labels: jax.Array
    channels: jax.Array


def ds_write_kv(
    pool: DoubleSparsePool,
    layer_idx: jax.Array,
    new_k: jax.Array,  # [B, E, H, D]
    new_v: jax.Array,
    out_slots: jax.Array,  # [B, E]
) -> DoubleSparsePool:
    ps = pool.data.shape[4]
    flat = out_slots.reshape(-1)
    pages = flat // ps
    offs = flat % ps
    nk = new_k.reshape(-1, *new_k.shape[2:]).astype(pool.data.dtype)
    nv = new_v.reshape(-1, *new_v.shape[2:]).astype(pool.data.dtype)
    data = pool.data.at[layer_idx, 0, :, pages, offs].set(nk, mode="drop")
    data = data.at[layer_idx, 1, :, pages, offs].set(nv, mode="drop")
    ch = pool.channels[layer_idx]  # [H, r]
    # labels: K restricted to each head's heavy channels -> [T, H, r]
    lab = jnp.take_along_axis(nk, ch[None, :, :], axis=-1)
    labels = pool.labels.at[layer_idx, :, pages, offs].set(
        lab.astype(pool.labels.dtype), mode="drop"
    )
    return DoubleSparsePool(data=data, labels=labels, channels=pool.channels)


def ds_decode_attention_xla(
    q: jax.Array,  # [B, 1, Hq, D]
    pool: DoubleSparsePool,
    layer_idx: jax.Array,
    page_tables: jax.Array,  # [B, P]
    seq_lens: jax.Array,  # [B]
    page_size: int,
    scale: float,
    token_k: int,
) -> jax.Array:
    """Sparse decode: label-score -> top-k tokens -> exact attention over
    the selected rows.  Exact when token_k >= seq_len."""
    B, E, Hq, D = q.shape
    assert E == 1
    P = page_tables.shape[1]
    Hkv = pool.data.shape[2]
    G = Hq // Hkv
    r = pool.labels.shape[-1]
    Lkv = P * page_size
    k_sel = min(token_k, Lkv)

    ch = pool.channels[layer_idx]  # [Hkv, r]
    q4 = q[:, 0].reshape(B, Hkv, G, D)
    # query restricted to each kv-head's heavy channels
    q_lab = jnp.take_along_axis(
        q4.astype(jnp.float32), ch[None, :, None, :], axis=-1
    )  # [B, Hkv, G, r]

    labels = pool.labels[layer_idx][:, page_tables]  # [Hkv, B, P, ps, r]
    labels = jnp.moveaxis(labels, 0, 1).reshape(B, Hkv, Lkv, r)
    approx = jnp.einsum(
        "bhgr,bhtr->bhgt", q_lab, labels.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # [B, Hkv, G, Lkv]
    kv_pos = jnp.arange(Lkv, dtype=jnp.int32)
    valid = kv_pos[None, :] < seq_lens[:, None]  # [B, Lkv]
    approx = jnp.where(valid[:, None, None, :], approx, NEG_INF)
    # per-(kv head) token selection: max over the query group (the heavy
    # tokens of any grouped query must survive)
    sel_scores = jnp.max(approx, axis=2)  # [B, Hkv, Lkv]
    _, top_idx = jax.lax.top_k(sel_scores, k_sel)  # [B, Hkv, k]

    k_rows = pool.data[layer_idx, 0][:, page_tables]  # [Hkv, B, P, ps, D]
    v_rows = pool.data[layer_idx, 1][:, page_tables]
    k_rows = jnp.moveaxis(k_rows, 0, 1).reshape(B, Hkv, Lkv, D)
    v_rows = jnp.moveaxis(v_rows, 0, 1).reshape(B, Hkv, Lkv, D)
    k_sel_rows = jnp.take_along_axis(
        k_rows, top_idx[..., None], axis=2
    ).astype(jnp.float32)  # [B, Hkv, k, D]
    v_sel_rows = jnp.take_along_axis(
        v_rows, top_idx[..., None], axis=2
    ).astype(jnp.float32)
    sel_valid = jnp.take_along_axis(
        jnp.broadcast_to(valid[:, None, :], sel_scores.shape), top_idx, axis=2
    )  # [B, Hkv, k]

    s = (
        jnp.einsum(
            "bhgd,bhtd->bhgt", q4.astype(jnp.float32), k_sel_rows,
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    s = jnp.where(sel_valid[:, :, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "bhgt,bhtd->bhgd", p, v_sel_rows, preferred_element_type=jnp.float32
    )
    return out.reshape(B, 1, Hq, D).astype(q.dtype)


def default_heavy_channels(
    wk_stack, num_layers: int, num_kv_heads: int, head_dim: int, r: int
):
    """Heavy channels from the K projection's output-channel norms
    (calibration-free fallback for the reference's ds_channel_config):
    channels whose weights produce the largest-magnitude K components
    dominate the score approximation."""
    import numpy as np

    ch = np.zeros((num_layers, num_kv_heads, r), np.int32)
    if wk_stack is None:
        ch[:] = np.arange(r, dtype=np.int32)[None, None, :]
        return ch
    w = np.asarray(jax.device_get(wk_stack), np.float32)
    # expected stacked layout [L, D_in, H*Dh]
    for l in range(num_layers):
        proj = w[l].reshape(w[l].shape[0], num_kv_heads, head_dim)
        norms = np.linalg.norm(proj, axis=0)  # [H, Dh]
        ch[l] = np.argsort(-norms, axis=-1)[:, :r].astype(np.int32)
    return np.sort(ch, axis=-1)
