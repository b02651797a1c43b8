"""OLMo v1 decoder.

Counterpart of the reference's `srt/models/olmo.py` (behavioral spec: HF
`modeling_olmo.py`): the Llama trunk with NON-PARAMETRIC LayerNorm (no
weight, no bias — pure mean/variance normalization in f32) and optional
``clip_qkv`` clamping of the q/k/v projections.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM
from sglang_npu_tpu.layers.ops import apply_rope_cs


def _ln_plain(x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class OlmoForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        self.clip_qkv = config.hf_config.get("clip_qkv")

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        # non-parametric norms: drop the weights entirely
        for k in ("input_norm", "post_norm"):
            del shapes["layers"][k]
        del shapes["final_norm"]
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        for k in ("input_norm", "post_norm"):
            del specs["layers"][k]
        del specs["final_norm"]
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        top.pop("model.norm.weight", None)
        per_layer.pop("input_layernorm.weight", None)
        per_layer.pop("post_attention_layernorm.weight", None)
        return top, per_layer

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
        rope_cs = self._rope_cos_sin(fb)
        clip = self.clip_qkv

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            h = _ln_plain(x)
            q = qmm(h, lp["wq"], "bed,dh->beh")
            k = qmm(h, lp["wk"], "bed,dh->beh")
            v = qmm(h, lp["wv"], "bed,dh->beh")
            if clip:
                q = jnp.clip(q, -clip, clip)
                k = jnp.clip(k, -clip, clip)
                v = jnp.clip(v, -clip, clip)
            q = q.reshape(B, E, c.num_attention_heads, c.head_dim)
            k = k.reshape(B, E, c.num_key_value_heads, c.head_dim)
            v = v.reshape(B, E, c.num_key_value_heads, c.head_dim)
            q, k = apply_rope_cs(q, k, *rope_cs)
            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            x = x + qmm(
                att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed"
            )
            h2 = _ln_plain(x)
            g = qmm(h2, lp["w_gate"], "bed,df->bef")
            u = qmm(h2, lp["w_up"], "bed,df->bef")
            x = x + qmm(jax.nn.silu(g) * u, lp["w_down"], "bef,fd->bed")
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        return _ln_plain(x), new_kv


ENTRY_CLASS = OlmoForCausalLM
