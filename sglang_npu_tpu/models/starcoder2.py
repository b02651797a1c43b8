"""Starcoder2 decoder.

Counterpart of the reference's `srt/models/starcoder2.py` (behavioral
spec: HF `modeling_starcoder2.py`): GPT-style blocks on the llama-shaped
trunk — LayerNorm (mean-subtracting, with bias) instead of RMSNorm,
biases on every projection, and a two-matmul GELU(tanh) MLP (c_fc/c_proj)
instead of SwiGLU.  Rope is standard full-head-dim neox; the lm_head ties
to the embedding.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import apply_rope_cs
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM


def layer_norm(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class Starcoder2ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        self.ln_eps = config.hf_config.get("norm_epsilon", 1e-5)

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, D, F = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        layers = shapes["layers"]
        for k in ("w_gate", "w_up", "w_down"):
            del layers[k]
        layers["c_fc"] = ((L, D, F), dt)
        layers["b_fc"] = ((L, F), dt)
        layers["c_proj"] = ((L, F, D), dt)
        layers["b_proj"] = ((L, D), dt)
        layers["bo"] = ((L, D), dt)
        layers["input_norm_b"] = ((L, D), jnp.float32)
        layers["post_norm_b"] = ((L, D), jnp.float32)
        shapes["final_norm_b"] = ((c.hidden_size,), jnp.float32)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        layers = specs["layers"]
        for k in ("w_gate", "w_up", "w_down"):
            del layers[k]
        layers["c_fc"] = P(None, None, "model")
        layers["b_fc"] = P(None, "model")
        layers["c_proj"] = P(None, "model", None)
        layers["b_proj"] = P(None, None)
        layers["bo"] = P(None, None)
        layers["input_norm_b"] = P(None, None)
        layers["post_norm_b"] = P(None, None)
        specs["final_norm_b"] = P(None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        for k in ("mlp.gate_proj.weight", "mlp.up_proj.weight",
                  "mlp.down_proj.weight"):
            per_layer.pop(k, None)
        top["model.norm.bias"] = ("final_norm_b", None)
        per_layer.update({
            "mlp.c_fc.weight": ("layers.c_fc", "transpose"),
            "mlp.c_fc.bias": ("layers.b_fc", None),
            "mlp.c_proj.weight": ("layers.c_proj", "transpose"),
            "mlp.c_proj.bias": ("layers.b_proj", None),
            "self_attn.o_proj.bias": ("layers.bo", None),
            "input_layernorm.bias": ("layers.input_norm_b", None),
            "post_attention_layernorm.bias": ("layers.post_norm_b", None),
        })
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
            h = layer_norm(x, lp["input_norm"], lp["input_norm_b"], eps)
            q = qmm(h, lp["wq"], "bed,dh->beh") + lp["bq"]
            k = qmm(h, lp["wk"], "bed,dh->beh") + lp["bk"]
            v = qmm(h, lp["wv"], "bed,dh->beh") + lp["bv"]
            q = q.reshape(B, E, c.num_attention_heads, c.head_dim)
            k = k.reshape(B, E, c.num_key_value_heads, c.head_dim)
            v = v.reshape(B, E, c.num_key_value_heads, c.head_dim)
            q, k = apply_rope_cs(q, k, *rope_cs)
            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            x = x + (
                qmm(att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed")
                + lp["bo"]
            )
            h2 = layer_norm(x, lp["post_norm"], lp["post_norm_b"], eps)
            h2 = qmm(h2, lp["c_fc"], "bed,df->bef") + lp["b_fc"]
            h2 = jax.nn.gelu(h2.astype(jnp.float32), approximate=True).astype(
                x.dtype
            )
            x = x + (qmm(h2, lp["c_proj"], "bef,fd->bed") + lp["b_proj"])
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        x = layer_norm(x, params["final_norm"], params["final_norm_b"], eps)
        return x, new_kv


ENTRY_CLASS = Starcoder2ForCausalLM
