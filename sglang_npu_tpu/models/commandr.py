"""Cohere Command-R decoder.

Counterpart of the reference's `srt/models/commandr.py` (behavioral spec:
HF `modeling_cohere.py`): bias-free mean-subtracting LayerNorm, PARALLEL
residual (attention and the SwiGLU MLP both read the same single
per-layer LayerNorm and add into the residual together), interleaved
(pairwise) rope, optional per-(head, dim) qk LayerNorm BEFORE rope, tied
embeddings, and final logits MULTIPLIED by ``logit_scale``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM


def ln_nobias(x, w, eps):
    """Cohere LayerNorm: mean-subtracting, weight-only, f32."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)


def rope_pairs(x, cos, sin):
    """Pairwise (interleaved) rotation: adjacent (even, odd) dims form
    (re, im); cos/sin are the half tables [B, E, hd/2]."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    x32 = x.astype(jnp.float32)
    re, im = x32[..., 0::2], x32[..., 1::2]
    out = jnp.stack([re * cos - im * sin, im * cos + re * sin], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


class CohereForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.ln_eps = hf.get("layer_norm_eps", 1e-5)
        self.use_qk_norm = hf.get("use_qk_norm", False)
        # HF multiplies logits by logit_scale; base class divides
        self.logits_scaling = 1.0 / hf.get("logit_scale", 1.0)

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L = c.num_hidden_layers
        layers = shapes["layers"]
        del layers["post_norm"]
        if self.use_qk_norm:
            layers["q_norm"] = (
                (L, c.num_attention_heads, c.head_dim), jnp.float32,
            )
            layers["k_norm"] = (
                (L, c.num_key_value_heads, c.head_dim), jnp.float32,
            )
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        del specs["layers"]["post_norm"]
        if self.use_qk_norm:
            specs["layers"]["q_norm"] = P(None, "model", None)
            specs["layers"]["k_norm"] = P(None, None, None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        per_layer.pop("post_attention_layernorm.weight", None)
        if self.use_qk_norm:
            per_layer["self_attn.q_norm.weight"] = ("layers.q_norm", None)
            per_layer["self_attn.k_norm.weight"] = ("layers.k_norm", None)
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
        eps = self.ln_eps
        rope_cs = self._rope_cos_sin(fb)

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            h = ln_nobias(x, lp["input_norm"], eps)
            q = qmm(h, lp["wq"], "bed,dh->beh").reshape(
                B, E, c.num_attention_heads, c.head_dim
            )
            k = qmm(h, lp["wk"], "bed,dh->beh").reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            v = qmm(h, lp["wv"], "bed,dh->beh").reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            if self.use_qk_norm:  # per-(head, dim) weights, BEFORE rope
                q = ln_nobias(q, lp["q_norm"], eps)
                k = ln_nobias(k, lp["k_norm"], eps)
            q = rope_pairs(q, *rope_cs)
            k = rope_pairs(k, *rope_cs)
            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            attn_out = qmm(
                att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed"
            )
            # parallel residual: MLP reads the same layernorm output
            g = qmm(h, lp["w_gate"], "bed,df->bef")
            u = qmm(h, lp["w_up"], "bed,df->bef")
            mlp_out = qmm(jax.nn.silu(g) * u, lp["w_down"], "bef,fd->bed")
            x = x + attn_out + mlp_out
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        x = ln_nobias(x, params["final_norm"], eps)
        return x, new_kv


ENTRY_CLASS = CohereForCausalLM
