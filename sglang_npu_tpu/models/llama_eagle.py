"""EAGLE draft head (hidden-state-conditioned speculative drafts).

Counterpart of the reference's `srt/models/llama_eagle.py` (EAGLE-1) /
`llama_eagle3.py`: a shallow llama-style decoder whose input is
fc(concat(embed(token), previous_target_hidden)) and whose logits reuse
the target's lm_head.  The draft maintains its own (few-layer) paged KV
cache in lockstep slot ids with the target pool.

HF checkpoint layout (yuhuili/EAGLE-* heads): `fc.weight` plus
`layers.N.*` llama decoder tensors; embed/lm_head come from the target.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import apply_rope, make_rope_tables, rms_norm
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.ops.xla_attention import paged_attention_xla, write_kv


NEG_INF = -1e9


def tree_attention(
    q,  # [B, K, H, D]
    kv_pool,  # [Ld, 2, Hkv, NP, ps, D] (read-only)
    layer: int,
    page_tables,  # [B, P]
    prefix_lens,  # [B] committed tokens in the draft pool
    path_k,  # [B, K, Scap, Hkv, D] ancestor keys (roped)
    path_v,  # [B, K, Scap, Hkv, D]
    k_self,  # [B, K, Hkv, D] this node's key
    v_self,  # [B, K, Hkv, D]
    path_len: int,  # valid ancestor entries (static)
    page_size: int,
    scale: float,
):
    """Attention for one tree-draft depth (reference
    `eagle_worker.draft_forward:609` top-k tree expansion): each beam
    attends the committed prefix (paged pool) + its OWN ancestor path
    (carried in registers — beams re-gather paths on re-selection, so no
    cross-beam masking and no pool writes during the search).
    Returns [B, K, H*D]."""
    B, K, H, D = q.shape
    Hkv = kv_pool.shape[2]
    G = H // Hkv
    P = page_tables.shape[1]
    Lkv = P * page_size
    q5 = q.reshape(B, K, Hkv, G, D)

    kp = kv_pool[layer, 0][:, page_tables]  # [Hkv, B, P, ps, D]
    vp = kv_pool[layer, 1][:, page_tables]
    kp = jnp.moveaxis(kp, 0, 1).reshape(B, Hkv, Lkv, D)
    vp = jnp.moveaxis(vp, 0, 1).reshape(B, Hkv, Lkv, D)
    s_pre = (
        jnp.einsum(
            "bkhgd,bhtd->bkhgt", q5, kp, preferred_element_type=jnp.float32
        )
        * scale
    )
    kv_pos = jnp.arange(Lkv, dtype=jnp.int32)
    pre_mask = kv_pos[None, :] < prefix_lens[:, None]  # [B, Lkv]
    s_pre = jnp.where(pre_mask[:, None, None, None, :], s_pre, NEG_INF)

    pk = jnp.concatenate(
        [path_k[:, :, :path_len], k_self[:, :, None]], axis=2
    )  # [B, K, s+1, Hkv, D]
    pv = jnp.concatenate(
        [path_v[:, :, :path_len], v_self[:, :, None]], axis=2
    )
    s_path = (
        jnp.einsum(
            "bkhgd,bkthd->bkhgt", q5, pk, preferred_element_type=jnp.float32
        )
        * scale
    )
    s_all = jnp.concatenate([s_pre, s_path], axis=-1)
    p = jax.nn.softmax(s_all, axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "bkhgt,bhtd->bkhgd", p[..., :Lkv], vp,
        preferred_element_type=jnp.float32,
    )
    out = out + jnp.einsum(
        "bkhgt,bkthd->bkhgd", p[..., Lkv:], pv,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype).reshape(B, K, H * D)


class EagleDraftModel:
    """Functional EAGLE draft: scan over (usually one) decoder layers.

    The pytree does NOT include embed/lm_head — the caller passes the
    target's (they are shared, reference `llama_eagle.py` ties them)."""

    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        self.q_size = c.num_attention_heads * c.head_dim
        self.kv_size = c.num_key_value_heads * c.head_dim
        self.scale = c.head_dim**-0.5
        self.rope = make_rope_tables(
            c.head_dim,
            max(c.context_length, c.max_position_embeddings),
            c.rope_theta,
            c.rope_scaling,
        )

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, D, F = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        return {
            "fc": ((2 * D, D), dt),
            "layers": {
                # EAGLE layer 0 has no input_layernorm on the hidden path;
                # we keep one norm slot per layer and set layer-0's to ones
                # at load when the checkpoint omits it.
                "input_norm": ((L, D), jnp.float32),
                "post_norm": ((L, D), jnp.float32),
                "wq": ((L, D, self.q_size), dt),
                "wk": ((L, D, self.kv_size), dt),
                "wv": ((L, D, self.kv_size), dt),
                "wo": ((L, self.q_size, D), dt),
                "w_gate": ((L, D, F), dt),
                "w_up": ((L, D, F), dt),
                "w_down": ((L, F, D), dt),
            },
        }

    def param_shardings(self) -> Dict[str, Any]:
        return {
            "fc": P(None, None),
            "layers": {
                "input_norm": P(None, None),
                "post_norm": P(None, None),
                "wq": P(None, None, "model"),
                "wk": P(None, None, "model"),
                "wv": P(None, None, "model"),
                "wo": P(None, "model", None),
                "w_gate": P(None, None, "model"),
                "w_up": P(None, None, "model"),
                "w_down": P(None, "model", None),
            },
        }

    def hf_weight_map(self):
        m = {"fc.weight": ("fc", "transpose")}
        per_layer = {
            "input_layernorm.weight": ("layers.input_norm", None),
            "hidden_norm.weight": ("layers.input_norm", None),  # eagle3 name
            "post_attention_layernorm.weight": ("layers.post_norm", None),
            "self_attn.q_proj.weight": ("layers.wq", "transpose"),
            "self_attn.k_proj.weight": ("layers.wk", "transpose"),
            "self_attn.v_proj.weight": ("layers.wv", "transpose"),
            "self_attn.o_proj.weight": ("layers.wo", "transpose"),
            "mlp.gate_proj.weight": ("layers.w_gate", "transpose"),
            "mlp.up_proj.weight": ("layers.w_up", "transpose"),
            "mlp.down_proj.weight": ("layers.w_down", "transpose"),
        }
        return m, per_layer

    # ------------------------------------------------------------------
    def make_draft_pool(self, num_pages: int, page_size: int, mesh):
        """Draft KV pool in the target's page/slot space."""
        from jax.sharding import NamedSharding

        c = self.config
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        shape = (
            c.num_hidden_layers, 2, c.num_key_value_heads,
            num_pages, page_size, c.head_dim,
        )
        return jax.device_put(
            jnp.zeros(shape, dt), NamedSharding(mesh, P())
        )

    # ------------------------------------------------------------------
    def forward(
        self,
        params: Dict[str, Any],
        embed: jax.Array,  # target's embedding table [V, D]
        kv_pool: jax.Array,  # draft pool [Ld, 2, Hkv, NP, ps, Dh]
        fb: ForwardBatch,
        page_size: int,
        prev_hidden: jax.Array,  # [B, E, D] target hidden of previous pos
    ):
        """Returns (hidden [B, E, D], new_kv_pool)."""
        c = self.config
        B, E = fb.input_ids.shape
        dt = prev_hidden.dtype
        emb = embed[fb.input_ids].astype(dt)
        x = qmm(
            jnp.concatenate([emb, prev_hidden.astype(dt)], axis=-1),
            params["fc"],
            "bed,dh->beh",
        )
        eps = c.rms_norm_eps
        rope = self.rope

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            h = rms_norm(x, lp["input_norm"], eps)
            q = qmm(h, lp["wq"], "bed,dh->beh").reshape(
                B, E, c.num_attention_heads, c.head_dim
            )
            k = qmm(h, lp["wk"], "bed,dh->beh").reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            v = qmm(h, lp["wv"], "bed,dh->beh").reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            q, k = apply_rope(q, k, fb.positions, rope)
            kv_pool = write_kv(kv_pool, l, k, v, fb.out_slots)
            att = paged_attention_xla(
                q, kv_pool, l, fb.page_tables, fb.seq_lens, fb.positions,
                page_size, self.scale,
            )
            x = x + qmm(
                att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed"
            )
            h2 = rms_norm(x, lp["post_norm"], eps)
            gate = qmm(h2, lp["w_gate"], "bed,df->bef")
            up = qmm(h2, lp["w_up"], "bed,df->bef")
            x = x + qmm(jax.nn.silu(gate) * up, lp["w_down"], "bef,fd->bed")
            return (x, kv_pool, l + 1), None

        (x, kv_pool, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        return x, kv_pool

    # ------------------------------------------------------------------
    def tree_step(
        self,
        params: Dict[str, Any],
        embed: jax.Array,
        kv_pool: jax.Array,  # read-only during the tree search
        page_tables: jax.Array,  # [B, P]
        prefix_lens: jax.Array,  # [B]
        positions: jax.Array,  # [B] this depth's position
        tokens: jax.Array,  # [B, K]
        prev_hidden: jax.Array,  # [B, K, D]
        path_k: jax.Array,  # [Ld, B, K, Scap, Hkv, Dh]
        path_v: jax.Array,
        path_len: int,
        page_size: int,
    ):
        """One depth of the top-k tree draft (reference
        `build_eagle_tree.py` / `eagle_worker.draft_forward:609`): forwards
        K live beams at the same position, each attending the committed
        prefix + its own carried ancestor K/V.  Returns
        (hidden [B, K, D], node_k, node_v [Ld, B, K, Hkv, Dh])."""
        c = self.config
        B, K = tokens.shape
        dt = prev_hidden.dtype
        emb = embed[tokens].astype(dt)
        x = qmm(
            jnp.concatenate([emb, prev_hidden.astype(dt)], axis=-1),
            params["fc"],
            "bkd,dh->bkh",
        )
        eps = c.rms_norm_eps
        pos2 = jnp.broadcast_to(positions[:, None], (B, K))
        Ld = path_k.shape[0]
        node_ks, node_vs = [], []
        for l in range(Ld):
            lp = jax.tree.map(lambda a: a[l], params["layers"])
            h = rms_norm(x, lp["input_norm"], eps)
            q = qmm(h, lp["wq"], "bkd,dh->bkh").reshape(
                B, K, c.num_attention_heads, c.head_dim
            )
            k = qmm(h, lp["wk"], "bkd,dh->bkh").reshape(
                B, K, c.num_key_value_heads, c.head_dim
            )
            v = qmm(h, lp["wv"], "bkd,dh->bkh").reshape(
                B, K, c.num_key_value_heads, c.head_dim
            )
            q, k = apply_rope(q, k, pos2, self.rope)
            att = tree_attention(
                q, kv_pool, l, page_tables, prefix_lens,
                path_k[l], path_v[l], k, v, path_len, page_size, self.scale,
            )
            x = x + qmm(att, lp["wo"], "bkh,hd->bkd")
            h2 = rms_norm(x, lp["post_norm"], eps)
            gate = qmm(h2, lp["w_gate"], "bkd,df->bkf")
            up = qmm(h2, lp["w_up"], "bkd,df->bkf")
            x = x + qmm(jax.nn.silu(gate) * up, lp["w_down"], "bkf,fd->bkd")
            node_ks.append(k)
            node_vs.append(v)
        return x, jnp.stack(node_ks), jnp.stack(node_vs)


class Eagle3DraftModel(EagleDraftModel):
    """EAGLE3 draft (reference `srt/models/llama_eagle3.py`): own
    embedding table, `fc` folding the target's THREE aux hidden states
    (3*target_hidden -> hidden), a dual-norm "midlayer" whose attention
    input is concat(input_layernorm(embed), hidden_norm(hidden)) [2D],
    with the incoming hidden (not the embed) as the residual stream, an
    own final norm, and a draft-vocab lm_head whose top-k ids map to
    target ids through the d2t diff table."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.draft_vocab = hf.get("draft_vocab_size") or config.vocab_size
        self.target_hidden = hf.get("target_hidden_size", config.hidden_size)

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, D, F = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        return {
            "embed": ((c.vocab_size, D), dt),
            "fc": ((3 * self.target_hidden, D), dt),
            "final_norm": ((D,), jnp.float32),
            "lm_head": ((D, self.draft_vocab), dt),
            "d2t": ((self.draft_vocab,), jnp.int32),
            "layers": {
                "input_norm": ((L, D), jnp.float32),   # on the embeds
                "hidden_norm": ((L, D), jnp.float32),  # on the spec hidden
                "post_norm": ((L, D), jnp.float32),
                "wq": ((L, 2 * D, self.q_size), dt),
                "wk": ((L, 2 * D, self.kv_size), dt),
                "wv": ((L, 2 * D, self.kv_size), dt),
                "wo": ((L, self.q_size, D), dt),
                "w_gate": ((L, D, F), dt),
                "w_up": ((L, D, F), dt),
                "w_down": ((L, F, D), dt),
            },
        }

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["embed"] = P(None, None)
        specs["final_norm"] = P(None)
        specs["lm_head"] = P(None, "model")
        specs["d2t"] = P(None)
        specs["layers"]["hidden_norm"] = P(None, None)
        return specs

    def hf_weight_map(self):
        # EAGLE3 checkpoints: model.fc / model.midlayer.* / model.norm /
        # model.embed_tokens / lm_head / d2t.  The single midlayer loads
        # through the top map — the stacked [1, ...] target broadcasts.
        m = {
            "model.embed_tokens.weight": ("embed", None),
            "embed_tokens.weight": ("embed", None),
            "model.fc.weight": ("fc", "transpose"),
            "fc.weight": ("fc", "transpose"),
            "model.norm.weight": ("final_norm", None),
            "norm.weight": ("final_norm", None),
            "lm_head.weight": ("lm_head", "transpose"),
            "d2t": ("d2t", None),
        }
        for pre in ("model.midlayer.", "midlayer."):
            for suffix, dst, tr in (
                ("input_layernorm.weight", "layers.input_norm", None),
                ("hidden_norm.weight", "layers.hidden_norm", None),
                ("post_attention_layernorm.weight", "layers.post_norm", None),
                ("self_attn.q_proj.weight", "layers.wq", "transpose"),
                ("self_attn.k_proj.weight", "layers.wk", "transpose"),
                ("self_attn.v_proj.weight", "layers.wv", "transpose"),
                ("self_attn.o_proj.weight", "layers.wo", "transpose"),
                ("mlp.gate_proj.weight", "layers.w_gate", "transpose"),
                ("mlp.up_proj.weight", "layers.w_up", "transpose"),
                ("mlp.down_proj.weight", "layers.w_down", "transpose"),
            ):
                m[pre + suffix] = (dst, tr)
        return m, {}

    # ------------------------------------------------------------------
    def apply_fc(self, params, aux_cat: jax.Array) -> jax.Array:
        """[..., 3*target_hidden] -> [..., D]."""
        return aux_cat.astype(params["fc"].dtype) @ params["fc"]

    def draft_logits(self, params, h: jax.Array) -> jax.Array:
        """Pre-norm draft hidden -> draft-vocab logits."""
        hn = rms_norm(h, params["final_norm"], self.config.rms_norm_eps)
        return jnp.einsum(
            "...d,dv->...v", hn, params["lm_head"],
            preferred_element_type=jnp.float32,
        )

    def map_draft_ids(self, params, draft_ids: jax.Array) -> jax.Array:
        """Draft-vocab ids -> target-vocab ids (d2t stores diffs)."""
        return draft_ids + params["d2t"][draft_ids]

    def forward(
        self,
        params: Dict[str, Any],
        embed: jax.Array,  # unused: eagle3 has its own table
        kv_pool: jax.Array,
        fb: ForwardBatch,
        page_size: int,
        prev_hidden: jax.Array,  # [B, E, D] already fc-folded
    ):
        c = self.config
        B, E = fb.input_ids.shape
        dt = prev_hidden.dtype
        emb = params["embed"][fb.input_ids].astype(dt)
        eps = c.rms_norm_eps
        rope = self.rope
        x = prev_hidden.astype(dt)  # residual stream IS the spec hidden

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            e_n = rms_norm(emb, lp["input_norm"], eps)
            h_n = rms_norm(x, lp["hidden_norm"], eps)
            h = jnp.concatenate([e_n, h_n], axis=-1)  # [B, E, 2D]
            q = qmm(h, lp["wq"], "bed,dh->beh").reshape(
                B, E, c.num_attention_heads, c.head_dim
            )
            k = qmm(h, lp["wk"], "bed,dh->beh").reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            v = qmm(h, lp["wv"], "bed,dh->beh").reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            q, k = apply_rope(q, k, fb.positions, rope)
            kv_pool = write_kv(kv_pool, l, k, v, fb.out_slots)
            att = paged_attention_xla(
                q, kv_pool, l, fb.page_tables, fb.seq_lens, fb.positions,
                page_size, self.scale,
            )
            x = x + qmm(
                att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed"
            )
            h2 = rms_norm(x, lp["post_norm"], eps)
            gate = qmm(h2, lp["w_gate"], "bed,df->bef")
            up = qmm(h2, lp["w_up"], "bed,df->bef")
            x = x + qmm(jax.nn.silu(gate) * up, lp["w_down"], "bef,fd->bed")
            return (x, kv_pool, l + 1), None

        (x, kv_pool, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        # returns the PRE-norm hidden (next-step conditioning); logits go
        # through draft_logits (reference "capture before norm")
        return x, kv_pool

    def tree_step(
        self,
        params: Dict[str, Any],
        embed: jax.Array,  # unused: eagle3 has its own table
        kv_pool: jax.Array,
        page_tables: jax.Array,
        prefix_lens: jax.Array,
        positions: jax.Array,
        tokens: jax.Array,  # [B, K] target-vocab ids
        prev_hidden: jax.Array,  # [B, K, D]
        path_k: jax.Array,
        path_v: jax.Array,
        path_len: int,
        page_size: int,
    ):
        c = self.config
        B, K = tokens.shape
        dt = prev_hidden.dtype
        emb = params["embed"][tokens].astype(dt)
        x = prev_hidden.astype(dt)
        eps = c.rms_norm_eps
        pos2 = jnp.broadcast_to(positions[:, None], (B, K))
        Ld = path_k.shape[0]
        node_ks, node_vs = [], []
        for l in range(Ld):
            lp = jax.tree.map(lambda a: a[l], params["layers"])
            e_n = rms_norm(emb, lp["input_norm"], eps)
            h_n = rms_norm(x, lp["hidden_norm"], eps)
            h = jnp.concatenate([e_n, h_n], axis=-1)
            q = qmm(h, lp["wq"], "bkd,dh->bkh").reshape(
                B, K, c.num_attention_heads, c.head_dim
            )
            k = qmm(h, lp["wk"], "bkd,dh->bkh").reshape(
                B, K, c.num_key_value_heads, c.head_dim
            )
            v = qmm(h, lp["wv"], "bkd,dh->bkh").reshape(
                B, K, c.num_key_value_heads, c.head_dim
            )
            q, k = apply_rope(q, k, pos2, self.rope)
            att = tree_attention(
                q, kv_pool, l, page_tables, prefix_lens,
                path_k[l], path_v[l], k, v, path_len, page_size, self.scale,
            )
            x = x + qmm(att, lp["wo"], "bkh,hd->bkd")
            h2 = rms_norm(x, lp["post_norm"], eps)
            gate = qmm(h2, lp["w_gate"], "bkd,df->bkf")
            up = qmm(h2, lp["w_up"], "bkd,df->bkf")
            x = x + qmm(jax.nn.silu(gate) * up, lp["w_down"], "bkf,fd->bkd")
            node_ks.append(k)
            node_vs.append(v)
        return x, jnp.stack(node_ks), jnp.stack(node_vs)


ENTRY_CLASS = EagleDraftModel
