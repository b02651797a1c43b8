"""Grok-1 decoder (xAI).

Counterpart of the reference's `srt/models/grok.py:1`: a Mixtral-class
MoE trunk with Grok's signatures —

  * SANDWICH norms: pre_attn_norm -> attn -> post_attn_norm BEFORE the
    residual add, and likewise pre/post_moe_norm around the MoE
    (reference `grok.py:353-356, 398-409`);
  * attention logit softcap 30*tanh(s/30) (`attn_logit_softcapping`);
  * router logits softcapped the same way before softmax top-k with NO
    renormalization (`router_logit_softcapping`, `grok.py:107-116`);
  * GELU (exact) expert activation;
  * embeddings x `embedding_multiplier_scale`, logits x
    `output_multiplier_scale`.

Checkpoint naming is mixtral-style (`block_sparse_moe.gate` /
`experts.{e}.w1|w3|w2`) plus the four grok norm names."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.qwen_moe import QwenMoeForCausalLM


class Grok1ForCausalLM(QwenMoeForCausalLM):
    moe_act = "gelu"

    def __init__(self, config: ModelConfig, attn_backend=None):
        hf = config.hf_config
        if "num_experts" not in hf and "num_local_experts" in hf:
            hf["num_experts"] = hf["num_local_experts"]
        super().__init__(config, attn_backend)
        self.norm_topk = False  # grok TopK(renormalize=False)
        self.router_softcap = float(hf.get("router_logit_softcapping", 30.0))
        config.logit_cap = float(hf.get("attn_logit_softcapping", 30.0))
        self.embedding_multiplier = float(
            hf.get("embedding_multiplier_scale", 1.0)
        )
        om = float(hf.get("output_multiplier_scale", 1.0))
        self.logits_scaling = 1.0 / om if om else 1.0  # trunk DIVIDES

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        L, D = self.config.num_hidden_layers, self.config.hidden_size
        # sandwich norms: input_norm = pre_attn, post_norm = pre_moe, plus
        # the two output-side norms
        shapes["layers"]["post_attn_norm"] = ((L, D), jnp.float32)
        shapes["layers"]["post_moe_norm"] = ((L, D), jnp.float32)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["layers"]["post_attn_norm"] = P(None, None)
        specs["layers"]["post_moe_norm"] = P(None, None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        per_layer.pop("input_layernorm.weight", None)
        per_layer.pop("post_attention_layernorm.weight", None)
        per_layer["pre_attn_norm.weight"] = ("layers.input_norm", None)
        per_layer["post_attn_norm.weight"] = ("layers.post_attn_norm", None)
        per_layer["pre_moe_norm.weight"] = ("layers.post_norm", None)
        per_layer["post_moe_norm.weight"] = ("layers.post_moe_norm", None)
        return top, per_layer

    # ------------------------------------------------------------------
    def backbone_forward(
        self, params, kv_pool, fb: ForwardBatch, page_size: int,
        collect_moe: bool = False, moe_mask=None, aux_after=None,
    ):
        assert aux_after is None
        import jax

        from sglang_npu_tpu.layers.ops import rms_norm
        from sglang_npu_tpu.layers.quantization import matmul as qmm

        c = self.config
        B, E = fb.input_ids.shape
        x = params["embed"][fb.input_ids].astype(
            jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        )
        x = x * jnp.asarray(self.embedding_multiplier, x.dtype)
        eps = c.rms_norm_eps
        rope_cs = self._rope_cos_sin(fb)
        smask = (
            jnp.repeat(moe_mask, E)
            if collect_moe and moe_mask is not None
            else None
        )

        from sglang_npu_tpu.layers.quantization import (
            QuantizedWeight,
            QuantizedWeightW4,
        )

        stacked_quant = {
            k: v
            for k, v in params["layers"].items()
            if isinstance(v, (QuantizedWeight, QuantizedWeightW4))
            and v.q.ndim == 3
        }
        xs_layers = {
            k: v for k, v in params["layers"].items()
            if k not in stacked_quant
        }

        def _proj(h, lp, wkey, eq):
            lay = lp.get("__layer__") if wkey in stacked_quant else None
            return qmm(h, lp[wkey], eq, layer=lay)

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            lp = {**lp, **stacked_quant, "__layer__": l}
            h = rms_norm(x, lp["input_norm"], eps)  # pre_attn
            q, k, v = self._qkv_proj(h, lp, _proj)
            q = q.reshape(B, E, c.num_attention_heads, c.head_dim)
            k = k.reshape(B, E, c.num_key_value_heads, c.head_dim)
            v = v.reshape(B, E, c.num_key_value_heads, c.head_dim)
            q, k = self.rope_apply(q, k, rope_cs)
            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            att_out = _proj(
                att.reshape(B, E, self.q_size), lp, "wo", "beh,hd->bed"
            )
            x = x + rms_norm(att_out, lp["post_attn_norm"], eps)

            h2 = rms_norm(x, lp["post_norm"], eps)  # pre_moe
            if collect_moe:
                delta, stats = self._mlp(
                    h2, lp, _proj, collect_stats=True, stats_mask=smask
                )
                x = x + rms_norm(delta, lp["post_moe_norm"], eps)
                return (x, kv_pool, l + 1), stats
            delta = self._mlp(h2, lp, _proj)
            x = x + rms_norm(delta, lp["post_moe_norm"], eps)
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), ys = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), xs_layers
        )
        x = rms_norm(x, params["final_norm"], eps)
        if collect_moe:
            return x, new_kv, ys
        return x, new_kv


ENTRY_CLASS = Grok1ForCausalLM
