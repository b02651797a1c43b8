"""PhiMoE (Phi-3.5-MoE) decoder.

Counterpart of the reference's `srt/models/phimoe.py` (behavioral spec:
HF `modeling_phimoe.py`): mixtral-layout experts (w1/w2/w3 under
``block_sparse_moe``) routed by the deterministic inference branch of
SPARSEMIXER (argmax + threshold-band softmax, twice), BIASED LayerNorm
instead of RMSNorm, optional qkv biases, and an optionally biased
lm_head.  Longrope scaling comes through the shared rope tables.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.moe import moe_apply, sparsemixer_routing
from sglang_npu_tpu.layers.ops import apply_rope_cs
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.qwen_moe import QwenMoeForCausalLM
from sglang_npu_tpu.models.starcoder2 import layer_norm


class PhimoeForCausalLM(QwenMoeForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.ln_eps = hf.get("rms_norm_eps", 1e-5)
        self.jitter = hf.get("router_jitter_noise", 0.01)
        self.lm_head_bias = hf.get("lm_head_bias", False)

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, D = c.num_hidden_layers, c.hidden_size
        layers = shapes["layers"]
        layers["input_norm_b"] = ((L, D), jnp.float32)
        layers["post_norm_b"] = ((L, D), jnp.float32)
        shapes["final_norm_b"] = ((D,), jnp.float32)
        if self.lm_head_bias:
            shapes["lm_head_b"] = ((c.vocab_size,), jnp.float32)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["layers"]["input_norm_b"] = P(None, None)
        specs["layers"]["post_norm_b"] = P(None, None)
        specs["final_norm_b"] = P(None)
        if self.lm_head_bias:
            specs["lm_head_b"] = P(None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        top["model.norm.bias"] = ("final_norm_b", None)
        if self.lm_head_bias:
            top["lm_head.bias"] = ("lm_head_b", None)
        per_layer["input_layernorm.bias"] = ("layers.input_norm_b", None)
        per_layer["post_attention_layernorm.bias"] = (
            "layers.post_norm_b", None,
        )
        return top, per_layer

    def _mlp(self, h, lp, proj=None, collect_stats=False, stats_mask=None):
        B, E_, D = h.shape
        flat = h.reshape(B * E_, D)
        logits = jnp.einsum(
            "td,de->te", flat.astype(jnp.float32), lp["router"]
        )
        weights, ids = sparsemixer_routing(logits, self.jitter)
        out = moe_apply(
            flat, lp["e_gate"], lp["e_up"], lp["e_down"],
            weights, ids,
        ).reshape(B, E_, D)
        if collect_stats:
            from sglang_npu_tpu.layers.moe import routing_counts

            return out, routing_counts(ids, self.num_experts, stats_mask)
        return out

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
            q = qmm(h, lp["wq"], "bed,dh->beh")
            k = qmm(h, lp["wk"], "bed,dh->beh")
            v = qmm(h, lp["wv"], "bed,dh->beh")
            if "bq" in lp:
                q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
            q = q.reshape(B, E, c.num_attention_heads, c.head_dim)
            k = k.reshape(B, E, c.num_key_value_heads, c.head_dim)
            v = v.reshape(B, E, c.num_key_value_heads, c.head_dim)
            q, k = apply_rope_cs(q, k, *rope_cs)
            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            x = x + qmm(
                att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed"
            )
            h2 = layer_norm(x, lp["post_norm"], lp["post_norm_b"], eps)
            x = x + self._mlp(h2, lp)
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        x = layer_norm(x, params["final_norm"], params["final_norm_b"], eps)
        return x, new_kv


ENTRY_CLASS = PhimoeForCausalLM
