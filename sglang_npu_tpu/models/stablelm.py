"""StableLM (stablelm-2 / stablelm-zephyr) decoder.

Counterpart of the reference's `srt/models/stablelm.py` (behavioral
spec: HF `modeling_stablelm.py`): biased LayerNorm blocks, PARTIAL
rotary (``partial_rotary_factor``, default 0.25), optional qkv biases
(``use_qkv_bias``), optional per-head q/k LayerNorm (weight-only, one
norm per head), SwiGLU MLP, and either sequential or PARALLEL residual
(``use_parallel_residual``: mlp reads the same input LayerNorm).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import make_rope_tables
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM
from sglang_npu_tpu.models.phi import rope_partial
from sglang_npu_tpu.models.starcoder2 import layer_norm


class StableLmForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.ln_eps = hf.get("layer_norm_eps", 1e-5)
        self.rot_dims = int(
            config.head_dim * hf.get("partial_rotary_factor", 0.25)
        )
        self.qkv_bias = hf.get("use_qkv_bias", False)
        self.qk_layernorm = hf.get("qk_layernorm", False)
        self.parallel_residual = hf.get("use_parallel_residual", False)
        self.rope = make_rope_tables(
            self.rot_dims,
            max(config.context_length, config.max_position_embeddings),
            config.rope_theta,
            config.rope_scaling,
        )

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, D = c.num_hidden_layers, c.hidden_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        layers = shapes["layers"]
        layers["input_norm_b"] = ((L, D), jnp.float32)
        if self.parallel_residual:
            del layers["post_norm"]
        else:
            layers["post_norm_b"] = ((L, D), jnp.float32)
        if self.qkv_bias and "bq" not in layers:
            layers["bq"] = ((L, self.q_size), dt)
            layers["bk"] = ((L, c.num_key_value_heads * c.head_dim), dt)
            layers["bv"] = ((L, c.num_key_value_heads * c.head_dim), dt)
        if self.qk_layernorm:
            layers["q_hnorm"] = (
                (L, c.num_attention_heads, c.head_dim), jnp.float32,
            )
            layers["k_hnorm"] = (
                (L, c.num_key_value_heads, c.head_dim), jnp.float32,
            )
        shapes["final_norm_b"] = ((c.hidden_size,), jnp.float32)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        layers = specs["layers"]
        layers["input_norm_b"] = P(None, None)
        if self.parallel_residual:
            del layers["post_norm"]
        else:
            layers["post_norm_b"] = P(None, None)
        if self.qkv_bias and "bq" not in layers:
            layers["bq"] = P(None, "model")
            layers["bk"] = P(None, None)
            layers["bv"] = P(None, None)
        if self.qk_layernorm:
            layers["q_hnorm"] = P(None, "model", None)
            layers["k_hnorm"] = P(None, None, None)
        specs["final_norm_b"] = P(None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        top["model.norm.bias"] = ("final_norm_b", None)
        per_layer["input_layernorm.bias"] = ("layers.input_norm_b", None)
        if self.parallel_residual:
            per_layer.pop("post_attention_layernorm.weight", None)
        else:
            per_layer["post_attention_layernorm.bias"] = (
                "layers.post_norm_b", None,
            )
        if self.qkv_bias:
            per_layer["self_attn.q_proj.bias"] = ("layers.bq", None)
            per_layer["self_attn.k_proj.bias"] = ("layers.bk", None)
            per_layer["self_attn.v_proj.bias"] = ("layers.bv", None)
        if self.qk_layernorm:
            c = self.config
            for h in range(c.num_attention_heads):
                per_layer[f"self_attn.q_layernorm.norms.{h}.weight"] = (
                    f"layers.q_hnorm.__expert__{h}", None,
                )
            for h in range(c.num_key_value_heads):
                per_layer[f"self_attn.k_layernorm.norms.{h}.weight"] = (
                    f"layers.k_hnorm.__expert__{h}", None,
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
        eps = self.ln_eps
        rope_cs = self._rope_cos_sin(fb)

        def _hn(t, w):
            """Per-head weight-only LayerNorm (bias=False)."""
            t32 = t.astype(jnp.float32)
            mu = t32.mean(-1, keepdims=True)
            var = ((t32 - mu) ** 2).mean(-1, keepdims=True)
            return ((t32 - mu) * jax.lax.rsqrt(var + eps) * w).astype(t.dtype)

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            h = layer_norm(x, lp["input_norm"], lp["input_norm_b"], eps)
            q = qmm(h, lp["wq"], "bed,dh->beh")
            k = qmm(h, lp["wk"], "bed,dh->beh")
            v = qmm(h, lp["wv"], "bed,dh->beh")
            if "bq" in lp:
                q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
            q = q.reshape(B, E, c.num_attention_heads, c.head_dim)
            k = k.reshape(B, E, c.num_key_value_heads, c.head_dim)
            v = v.reshape(B, E, c.num_key_value_heads, c.head_dim)
            if self.qk_layernorm:
                q = _hn(q, lp["q_hnorm"])
                k = _hn(k, lp["k_hnorm"])
            q, k = rope_partial(q, k, *rope_cs, self.rot_dims)
            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            attn_out = qmm(
                att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed"
            )

            def swiglu(inp):
                g = qmm(inp, lp["w_gate"], "bed,df->bef")
                u = qmm(inp, lp["w_up"], "bed,df->bef")
                return qmm(jax.nn.silu(g) * u, lp["w_down"], "bef,fd->bed")

            if self.parallel_residual:
                x = x + attn_out + swiglu(h)
            else:
                x = x + attn_out
                h2 = layer_norm(x, lp["post_norm"], lp["post_norm_b"], eps)
                x = x + swiglu(h2)
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        x = layer_norm(x, params["final_norm"], params["final_norm_b"], eps)
        return x, new_kv


ENTRY_CLASS = StableLmForCausalLM
