"""Phi-1/1.5/2 decoder.

Counterpart of the reference's `srt/models/phi.py` (behavioral spec: HF
`modeling_phi.py`): parallel residual — attention and the two-matmul
GELU(tanh) MLP both read the SAME single per-layer LayerNorm and add into
the residual together; partial rotary embedding (only the first
``head_dim * partial_rotary_factor`` dims rotate, neox half-split within
that slice); biases on qkv/dense/fc1/fc2, biased final LayerNorm, and a
BIASED untied lm_head.  Optional per-head qk LayerNorm (phi-2 small).
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
from sglang_npu_tpu.models.starcoder2 import layer_norm


def rope_partial(q, k, cos, sin, rot_dims: int):
    """Rotate only the first ``rot_dims`` of the head dim (HF partial
    rotary: neox half-split inside the rotated slice)."""
    q_rot, q_pass = q[..., :rot_dims], q[..., rot_dims:]
    k_rot, k_pass = k[..., :rot_dims], k[..., rot_dims:]
    q_rot, k_rot = apply_rope_cs(q_rot, k_rot, cos, sin)
    return (
        jnp.concatenate([q_rot, q_pass], -1),
        jnp.concatenate([k_rot, k_pass], -1),
    )


class PhiForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.ln_eps = hf.get("layer_norm_eps", 1e-5)
        self.rot_dims = int(
            config.head_dim * hf.get("partial_rotary_factor", 0.5)
        )
        self.qk_layernorm = hf.get("qk_layernorm", False)
        # rope tables sized for the rotated slice only
        from sglang_npu_tpu.layers.ops import make_rope_tables

        self.rope = make_rope_tables(
            self.rot_dims,
            max(config.context_length, config.max_position_embeddings),
            config.rope_theta,
            config.rope_scaling,
        )

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, D, F = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        layers = shapes["layers"]
        for k in ("w_gate", "w_up", "w_down", "post_norm"):
            del layers[k]
        layers["fc1"] = ((L, D, F), dt)
        layers["b_fc1"] = ((L, F), dt)
        layers["fc2"] = ((L, F, D), dt)
        layers["b_fc2"] = ((L, D), dt)
        layers["bo"] = ((L, D), dt)
        layers["input_norm_b"] = ((L, D), jnp.float32)
        if self.qk_layernorm:
            layers["q_norm"] = ((L, c.head_dim), jnp.float32)
            layers["q_norm_b"] = ((L, c.head_dim), jnp.float32)
            layers["k_norm"] = ((L, c.head_dim), jnp.float32)
            layers["k_norm_b"] = ((L, c.head_dim), jnp.float32)
        shapes["final_norm_b"] = ((D,), jnp.float32)
        shapes["lm_head_b"] = ((c.vocab_size,), jnp.float32)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        layers = specs["layers"]
        for k in ("w_gate", "w_up", "w_down", "post_norm"):
            del layers[k]
        layers["fc1"] = P(None, None, "model")
        layers["b_fc1"] = P(None, "model")
        layers["fc2"] = P(None, "model", None)
        layers["b_fc2"] = P(None, None)
        layers["bo"] = P(None, None)
        layers["input_norm_b"] = P(None, None)
        if self.qk_layernorm:
            for k in ("q_norm", "q_norm_b", "k_norm", "k_norm_b"):
                layers[k] = P(None, None)
        specs["final_norm_b"] = P(None)
        specs["lm_head_b"] = P(None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        for k in ("mlp.gate_proj.weight", "mlp.up_proj.weight",
                  "mlp.down_proj.weight", "post_attention_layernorm.weight",
                  "self_attn.o_proj.weight"):
            per_layer.pop(k, None)
        top["model.final_layernorm.weight"] = ("final_norm", None)
        top["model.final_layernorm.bias"] = ("final_norm_b", None)
        top.pop("model.norm.weight", None)
        top["lm_head.bias"] = ("lm_head_b", None)
        per_layer.update({
            "self_attn.dense.weight": ("layers.wo", "transpose"),
            "self_attn.dense.bias": ("layers.bo", None),
            "mlp.fc1.weight": ("layers.fc1", "transpose"),
            "mlp.fc1.bias": ("layers.b_fc1", None),
            "mlp.fc2.weight": ("layers.fc2", "transpose"),
            "mlp.fc2.bias": ("layers.b_fc2", None),
            "input_layernorm.bias": ("layers.input_norm_b", None),
        })
        if self.qk_layernorm:
            per_layer.update({
                "self_attn.q_layernorm.weight": ("layers.q_norm", None),
                "self_attn.q_layernorm.bias": ("layers.q_norm_b", None),
                "self_attn.k_layernorm.weight": ("layers.k_norm", None),
                "self_attn.k_layernorm.bias": ("layers.k_norm_b", None),
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
            if self.qk_layernorm:
                q = layer_norm(q, lp["q_norm"], lp["q_norm_b"], eps)
                k = layer_norm(k, lp["k_norm"], lp["k_norm_b"], eps)
            q, k = rope_partial(q, k, *rope_cs, self.rot_dims)
            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            attn_out = (
                qmm(att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed")
                + lp["bo"]
            )
            # parallel residual: MLP reads the same layernorm output
            h2 = qmm(h, lp["fc1"], "bed,df->bef") + lp["b_fc1"]
            h2 = jax.nn.gelu(h2.astype(jnp.float32), approximate=True).astype(
                x.dtype
            )
            mlp_out = qmm(h2, lp["fc2"], "bef,fd->bed") + lp["b_fc2"]
            x = x + attn_out + mlp_out
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        x = layer_norm(x, params["final_norm"], params["final_norm_b"], eps)
        return x, new_kv


ENTRY_CLASS = PhiForCausalLM
