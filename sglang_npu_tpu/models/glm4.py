"""GLM-4 family decoders: dense GLM-4 and GLM-4-MoE.

Counterpart of the reference's `srt/models/glm4.py` / `glm4_moe.py`
(behavioral spec: HF `modeling_glm4.py`, `modeling_glm4_moe.py`):

  * GLM-4 (dense): sandwich norms (post-attn and post-mlp RMSNorms applied
    to the block OUTPUT before the residual add), fused gate_up
    projection, qkv bias, and PARTIAL INTERLEAVED rope — only the first
    ``head_dim * partial_rotary_factor`` dims rotate, in (even, odd)
    interleaved pairs (HF `apply_rotary_pos_emb` with the interleave).
  * GLM-4-MoE: standard 2-norm llama layers (separate q/k/v, optional
    q/k-norm, the same partial rope) with DeepSeek-V3-style MoE after the
    first k dense layers: sigmoid router + e_score_correction_bias +
    group-restricted top-k (`layers/moe.sigmoid_group_topk_routing`),
    shared experts added unconditionally.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.moe import moe_apply, sigmoid_group_topk_routing
from sglang_npu_tpu.layers.ops import rms_norm
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM


def make_partial_interleaved_rope(rotary_dim: int, max_pos: int, theta: float):
    """cos/sin tables for GLM's partial interleaved rope: pair j (dims
    2j, 2j+1 of the first rotary_dim dims) rotates by pos * theta^(-2j/rd)."""
    inv_freq = theta ** (
        -np.arange(0, rotary_dim, 2, dtype=np.float64) / rotary_dim
    )
    pos = np.arange(max_pos, dtype=np.float64)
    ang = np.outer(pos, inv_freq)  # [max_pos, rd/2]
    return {
        "cos": jnp.asarray(np.cos(ang), jnp.float32),
        "sin": jnp.asarray(np.sin(ang), jnp.float32),
    }


def apply_partial_interleaved_rope(x, positions, tables, rotary_dim):
    """x [B, E, H, D]; rotate interleaved pairs of the first rotary_dim
    (HF glm/glm4 `apply_rotary_pos_emb` with the repeat_interleave)."""
    cos = tables["cos"][positions][:, :, None, :]  # [B, E, 1, rd/2]
    sin = tables["sin"][positions][:, :, None, :]
    xr = x[..., :rotary_dim].astype(jnp.float32)
    xp = x[..., rotary_dim:]
    x1, x2 = xr[..., 0::2], xr[..., 1::2]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    rot = jnp.stack([o1, o2], axis=-1).reshape(xr.shape).astype(x.dtype)
    return jnp.concatenate([rot, xp], axis=-1)


def apply_partial_neox_rope(x, positions, tables, rotary_dim):
    """x [B, E, H, D]; NEOX-style (half-split) rotation of the first
    rotary_dim dims (HF glm4_moe `apply_rotary_pos_emb` — no interleave):
    pair (x[j], x[j + rd/2]) rotates by freq j."""
    cos = tables["cos"][positions][:, :, None, :]  # [B, E, 1, rd/2]
    sin = tables["sin"][positions][:, :, None, :]
    xr = x[..., :rotary_dim].astype(jnp.float32)
    xp = x[..., rotary_dim:]
    half = rotary_dim // 2
    x1, x2 = xr[..., :half], xr[..., half:]
    rot = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)
    return jnp.concatenate([rot, xp], axis=-1)


class Glm4ForCausalLM(LlamaForCausalLM):
    """Dense GLM-4 (glm-4-9b-chat class)."""

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.partial = hf.get("partial_rotary_factor", 0.5)
        self.rotary_dim = int(config.head_dim * self.partial)
        self.glm_rope = make_partial_interleaved_rope(
            self.rotary_dim,
            max(config.context_length, config.max_position_embeddings),
            config.rope_theta,
        )

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, D, F = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        layers = shapes["layers"]
        for k in ("w_gate", "w_up"):
            del layers[k]
        layers["w_gateup"] = ((L, D, 2 * F), dt)  # HF keeps gate|up fused
        layers["post_self_attn_norm"] = ((L, D), jnp.float32)
        layers["post_mlp_norm"] = ((L, D), jnp.float32)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        layers = specs["layers"]
        for k in ("w_gate", "w_up"):
            del layers[k]
        # gate|up halves both shard on F: a 2F column shard would split
        # across the gate/up boundary, so keep it unsharded on TP>1 until
        # a split layout lands (correctness first)
        layers["w_gateup"] = P(None, None, None)
        layers["post_self_attn_norm"] = P(None, None)
        layers["post_mlp_norm"] = P(None, None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        for k in list(per_layer):
            if k in ("mlp.gate_proj.weight", "mlp.up_proj.weight"):
                del per_layer[k]
        per_layer["mlp.gate_up_proj.weight"] = ("layers.w_gateup", "transpose")
        per_layer["post_self_attn_layernorm.weight"] = (
            "layers.post_self_attn_norm", None,
        )
        per_layer["post_mlp_layernorm.weight"] = (
            "layers.post_mlp_norm", None,
        )
        return top, per_layer

    # ------------------------------------------------------------------
    def backbone_forward(
        self, params, kv_pool, fb: ForwardBatch, page_size: int,
        collect_moe: bool = False, moe_mask=None,
    ):
        assert not collect_moe
        c = self.config
        B, E = fb.input_ids.shape
        x = params["embed"][fb.input_ids].astype(
            jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        )
        eps = c.rms_norm_eps

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            h = rms_norm(x, lp["input_norm"], eps)
            q = qmm(h, lp["wq"], "bed,dh->beh") + lp["bq"]
            k = qmm(h, lp["wk"], "bed,dh->beh") + lp["bk"]
            v = qmm(h, lp["wv"], "bed,dh->beh") + lp["bv"]
            q = q.reshape(B, E, c.num_attention_heads, c.head_dim)
            k = k.reshape(B, E, c.num_key_value_heads, c.head_dim)
            v = v.reshape(B, E, c.num_key_value_heads, c.head_dim)
            q = apply_partial_interleaved_rope(
                q, fb.positions, self.glm_rope, self.rotary_dim
            )
            k = apply_partial_interleaved_rope(
                k, fb.positions, self.glm_rope, self.rotary_dim
            )
            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            att = qmm(
                att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed"
            )
            x = x + rms_norm(att, lp["post_self_attn_norm"], eps)

            h2 = rms_norm(x, lp["post_norm"], eps)
            gu = qmm(h2, lp["w_gateup"], "bed,df->bef")
            gate, up = jnp.split(gu, 2, axis=-1)
            mlp = qmm(
                up * jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype),
                lp["w_down"], "bef,fd->bed",
            )
            x = x + rms_norm(mlp, lp["post_mlp_norm"], eps)
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        x = rms_norm(x, params["final_norm"], eps)
        return x, new_kv


def _lk(i: int) -> str:
    return f"layer_{i}"


class Glm4MoeForCausalLM(LlamaForCausalLM):
    """GLM-4-MoE (GLM-4.5 class): llama layers + noaux sigmoid MoE."""

    num_experts = 0  # runner EP validation alias
    num_redundant = 0

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.first_dense = hf.get("first_k_dense_replace", 0)
        self.n_experts = hf.get("n_routed_experts", 0) or 0
        self.num_experts = self.n_experts
        self.n_shared = hf.get("n_shared_experts", 0) or 0
        self.top_k = hf.get("num_experts_per_tok", 8)
        self.moe_inter = hf.get("moe_intermediate_size", 0)
        self.n_group = hf.get("n_group", 1) or 1
        self.topk_group = hf.get("topk_group", 1) or 1
        self.routed_scaling = hf.get("routed_scaling_factor", 1.0)
        self.norm_topk = hf.get("norm_topk_prob", True)
        self.use_qk_norm = hf.get("use_qk_norm", False)
        self.partial = hf.get("partial_rotary_factor", 0.5)
        self.rotary_dim = int(config.head_dim * self.partial)
        # glm (glm-4-9b) interleaves the rotary pairs and fuses gate|up;
        # glm4_moe (GLM-4.5) uses NEOX half-split rope and separate
        # gate/up in its dense layers (HF modeling divergence)
        mt = hf.get("model_type", "glm4_moe")
        self.interleaved_rope = mt != "glm4_moe"
        self.fused_dense = mt == "glm"
        self.glm_rope = make_partial_interleaved_rope(
            self.rotary_dim,
            max(config.context_length, config.max_position_embeddings),
            config.rope_theta,
        )

    def _rope(self, x, positions):
        fn = (
            apply_partial_interleaved_rope
            if self.interleaved_rope
            else apply_partial_neox_rope
        )
        return fn(x, positions, self.glm_rope, self.rotary_dim)

    def _is_moe(self, i: int) -> bool:
        return self.n_experts > 0 and i >= self.first_dense

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        D = c.hidden_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        hf = c.hf_config
        bias = hf.get("attention_bias", False)
        shapes: Dict[str, Any] = {
            "embed": ((c.vocab_size, D), dt),
            "final_norm": ((D,), jnp.float32),
        }
        if not c.tie_word_embeddings:
            shapes["lm_head"] = ((D, c.vocab_size), dt)
        for i in range(c.num_hidden_layers):
            lp: Dict[str, Any] = {
                "input_norm": ((D,), jnp.float32),
                "post_norm": ((D,), jnp.float32),
                "wq": ((D, self.q_size), dt),
                "wk": ((D, self.kv_size), dt),
                "wv": ((D, self.kv_size), dt),
                "wo": ((self.q_size, D), dt),
            }
            if bias:
                lp["bq"] = ((self.q_size,), dt)
                lp["bk"] = ((self.kv_size,), dt)
                lp["bv"] = ((self.kv_size,), dt)
            if self.use_qk_norm:
                lp["q_norm"] = ((c.head_dim,), jnp.float32)
                lp["k_norm"] = ((c.head_dim,), jnp.float32)
            if self._is_moe(i):
                E, Fm = self.n_experts, self.moe_inter
                lp["router"] = ((D, E), jnp.float32)
                lp["router_bias"] = ((E,), jnp.float32)
                lp["e_gate"] = ((E, D, Fm), dt)
                lp["e_up"] = ((E, D, Fm), dt)
                lp["e_down"] = ((E, Fm, D), dt)
                if self.n_shared:
                    Fs = self.moe_inter * self.n_shared
                    lp["s_gate"] = ((D, Fs), dt)
                    lp["s_up"] = ((D, Fs), dt)
                    lp["s_down"] = ((Fs, D), dt)
            elif self.fused_dense:
                F = c.intermediate_size
                lp["w_gateup"] = ((D, 2 * F), dt)
                lp["w_down"] = ((F, D), dt)
            else:
                F = c.intermediate_size
                lp["w_gate"] = ((D, F), dt)
                lp["w_up"] = ((D, F), dt)
                lp["w_down"] = ((F, D), dt)
            shapes[_lk(i)] = lp
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        c = self.config
        specs: Dict[str, Any] = {
            "embed": P(None, "model"),
            "final_norm": P(None),
        }
        if not c.tie_word_embeddings:
            specs["lm_head"] = P(None, "model")
        for i in range(c.num_hidden_layers):
            lp = {
                "input_norm": P(None),
                "post_norm": P(None),
                "wq": P(None, "model"),
                "wk": P(None, "model"),
                "wv": P(None, "model"),
                "wo": P("model", None),
            }
            if c.hf_config.get("attention_bias", False):
                lp["bq"] = P("model")
                lp["bk"] = P("model")
                lp["bv"] = P("model")
            if self.use_qk_norm:
                lp["q_norm"] = P(None)
                lp["k_norm"] = P(None)
            if self._is_moe(i):
                lp["router"] = P(None, None)
                lp["router_bias"] = P(None)
                lp["e_gate"] = P(None, None, "model")
                lp["e_up"] = P(None, None, "model")
                lp["e_down"] = P(None, "model", None)
                if self.n_shared:
                    lp["s_gate"] = P(None, "model")
                    lp["s_up"] = P(None, "model")
                    lp["s_down"] = P("model", None)
            elif self.fused_dense:
                lp["w_gateup"] = P(None, None)  # gate|up split boundary
                lp["w_down"] = P("model", None)
            else:
                lp["w_gate"] = P(None, "model")
                lp["w_up"] = P(None, "model")
                lp["w_down"] = P("model", None)
            specs[_lk(i)] = lp
        return specs

    def hf_weight_map(self):
        c = self.config
        m: Dict[str, tuple] = {
            "model.embed_tokens.weight": ("embed", None),
            "model.norm.weight": ("final_norm", None),
        }
        if not c.tie_word_embeddings:
            m["lm_head.weight"] = ("lm_head", "transpose")
        bias = c.hf_config.get("attention_bias", False)
        for i in range(c.num_hidden_layers):
            pre = f"model.layers.{i}."
            k = _lk(i)
            m[pre + "input_layernorm.weight"] = (f"{k}.input_norm", None)
            m[pre + "post_attention_layernorm.weight"] = (f"{k}.post_norm", None)
            for proj, dst in (("q", "wq"), ("k", "wk"), ("v", "wv"), ("o", "wo")):
                m[pre + f"self_attn.{proj}_proj.weight"] = (
                    f"{k}.{dst}", "transpose",
                )
            if bias:
                for proj, dst in (("q", "bq"), ("k", "bk"), ("v", "bv")):
                    m[pre + f"self_attn.{proj}_proj.bias"] = (f"{k}.{dst}", None)
            if self.use_qk_norm:
                m[pre + "self_attn.q_norm.weight"] = (f"{k}.q_norm", None)
                m[pre + "self_attn.k_norm.weight"] = (f"{k}.k_norm", None)
            if self._is_moe(i):
                m[pre + "mlp.gate.weight"] = (f"{k}.router", "transpose")
                m[pre + "mlp.gate.e_score_correction_bias"] = (
                    f"{k}.router_bias", None,
                )
                for e in range(self.n_experts):
                    for part, dst in (
                        ("gate_proj", "e_gate"), ("up_proj", "e_up"),
                        ("down_proj", "e_down"),
                    ):
                        m[pre + f"mlp.experts.{e}.{part}.weight"] = (
                            f"{k}.{dst}.__expert__{e}", "transpose",
                        )
                if self.n_shared:
                    for part, dst in (
                        ("gate_proj", "s_gate"), ("up_proj", "s_up"),
                        ("down_proj", "s_down"),
                    ):
                        m[pre + f"mlp.shared_experts.{part}.weight"] = (
                            f"{k}.{dst}", "transpose",
                        )
            elif self.fused_dense:
                m[pre + "mlp.gate_up_proj.weight"] = (
                    f"{k}.w_gateup", "transpose",
                )
                m[pre + "mlp.down_proj.weight"] = (f"{k}.w_down", "transpose")
            else:
                m[pre + "mlp.gate_proj.weight"] = (f"{k}.w_gate", "transpose")
                m[pre + "mlp.up_proj.weight"] = (f"{k}.w_up", "transpose")
                m[pre + "mlp.down_proj.weight"] = (f"{k}.w_down", "transpose")
        return m, {}

    # ------------------------------------------------------------------
    def _ffn(self, lp, h2, i):
        c = self.config
        B, E = h2.shape[:2]
        if not self._is_moe(i):
            if self.fused_dense:
                gu = qmm(h2, lp["w_gateup"], "bed,df->bef")
                g, u = jnp.split(gu, 2, axis=-1)
            else:
                g = qmm(h2, lp["w_gate"], "bed,df->bef")
                u = qmm(h2, lp["w_up"], "bed,df->bef")
            act = u * jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype)
            return qmm(act, lp["w_down"], "bef,fd->bed")
        flat = h2.reshape(B * E, c.hidden_size)
        logits = jnp.einsum(
            "td,de->te", flat.astype(jnp.float32), lp["router"]
        )
        weights, ids = sigmoid_group_topk_routing(
            logits, lp["router_bias"], self.top_k,
            n_group=self.n_group, topk_group=self.topk_group,
            norm_topk_prob=self.norm_topk,
            routed_scaling=self.routed_scaling,
        )
        out = moe_apply(
            flat, lp["e_gate"], lp["e_up"], lp["e_down"], weights, ids
        )
        if self.n_shared:
            g = qmm(flat, lp["s_gate"], "td,df->tf")
            u = qmm(flat, lp["s_up"], "td,df->tf")
            act = u * jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype)
            out = out + qmm(act, lp["s_down"], "tf,fd->td")
        return out.reshape(B, E, c.hidden_size)

    def backbone_forward(
        self, params, kv_pool, fb: ForwardBatch, page_size: int,
        collect_moe: bool = False, moe_mask=None,
    ):
        assert not collect_moe, "EPLB stats for GLM-4-MoE land with EP"
        c = self.config
        B, E = fb.input_ids.shape
        x = params["embed"][fb.input_ids].astype(
            jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        )
        eps = c.rms_norm_eps
        for i in range(c.num_hidden_layers):
            lp = params[_lk(i)]
            h = rms_norm(x, lp["input_norm"], eps)
            q = qmm(h, lp["wq"], "bed,dh->beh")
            k = qmm(h, lp["wk"], "bed,dh->beh")
            v = qmm(h, lp["wv"], "bed,dh->beh")
            if "bq" in lp:
                q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
            q = q.reshape(B, E, c.num_attention_heads, c.head_dim)
            k = k.reshape(B, E, c.num_key_value_heads, c.head_dim)
            v = v.reshape(B, E, c.num_key_value_heads, c.head_dim)
            if self.use_qk_norm:
                q = rms_norm(q, lp["q_norm"], eps)
                k = rms_norm(k, lp["k_norm"], eps)
            q = self._rope(q, fb.positions)
            k = self._rope(k, fb.positions)
            att, kv_pool = self._attention(
                q, k, v, kv_pool, jnp.int32(i), fb, page_size
            )
            x = x + qmm(
                att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed"
            )
            h2 = rms_norm(x, lp["post_norm"], eps)
            x = x + self._ffn(lp, h2, i)
        x = rms_norm(x, params["final_norm"], eps)
        return x, kv_pool


ENTRY_CLASS = Glm4ForCausalLM
