"""DBRX decoder (Databricks MoE).

Counterpart of the reference's `srt/models/dbrx.py` (behavioral spec: HF
`modeling_dbrx.py`): fused clamped ``Wqkv`` projection, bias-free
LayerNorm pair per block, and an every-layer MoE whose experts ship as
flat ``[E*F, D]`` blobs (w1 gate / v1 up / w2 down, w2 used untransposed)
routed by softmax-all → top-k → p-norm renormalization
(``moe_normalize_expert_weights``).  Checkpoint tree is
``transformer.blocks.{i}.{norm_attn_norm.*, ffn.*}``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.moe import moe_apply
from sglang_npu_tpu.layers.ops import apply_rope_cs
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.commandr import ln_nobias
from sglang_npu_tpu.models.llama import LlamaForCausalLM


class DbrxForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        ac = hf.get("attn_config") or {}
        fc = hf.get("ffn_config") or {}
        self.clip_qkv = ac.get("clip_qkv")
        self.num_experts = fc.get("moe_num_experts", 4)
        self.top_k = fc.get("moe_top_k", 1)
        self.norm_p = fc.get("moe_normalize_expert_weights", 1.0)
        self.kv_size = config.num_key_value_heads * config.head_dim

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, D, F = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        E = self.num_experts
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        fused = self.q_size + 2 * self.kv_size
        return {
            "embed": ((c.vocab_size, D), dt),
            "final_norm": ((D,), jnp.float32),
            "lm_head": ((D, c.vocab_size), dt),
            "layers": {
                "norm1": ((L, D), jnp.float32),
                "norm2": ((L, D), jnp.float32),
                "w_qkv": ((L, D, fused), dt),
                "wo": ((L, self.q_size, D), dt),
                "router": ((L, D, E), jnp.float32),
                "e_gate": ((L, E, D, F), dt),
                "e_up": ((L, E, D, F), dt),
                "e_down": ((L, E, F, D), dt),
            },
        }

    def param_shardings(self) -> Dict[str, Any]:
        return {
            "embed": P(None, "model"),
            "final_norm": P(None),
            "lm_head": P(None, "model"),
            "layers": {
                "norm1": P(None, None),
                "norm2": P(None, None),
                "w_qkv": P(None, None, None),
                "wo": P(None, "model", None),
                "router": P(None, None, None),
                "e_gate": P(None, None, None, "model"),
                "e_up": P(None, None, None, "model"),
                "e_down": P(None, None, "model", None),
            },
        }

    def hf_weight_map(self):
        return {
            "transformer.wte.weight": ("embed", None),
            "transformer.norm_f.weight": ("final_norm", None),
            "lm_head.weight": ("lm_head", "transpose"),
        }, {}

    def hf_block_maps(self):
        return {
            "transformer.blocks.": {
                "norm_attn_norm.norm_1.weight": ("layers.norm1", None),
                "norm_attn_norm.norm_2.weight": ("layers.norm2", None),
                "norm_attn_norm.attn.Wqkv.weight": (
                    "layers.w_qkv", "transpose",
                ),
                "norm_attn_norm.attn.out_proj.weight": (
                    "layers.wo", "transpose",
                ),
                "ffn.router.layer.weight": ("layers.router", "transpose"),
                # flat [E*F, D] blobs; w2 is used untransposed ([E, F, D])
                "ffn.experts.mlp.w1": ("layers.e_gate", "unstack_experts_t"),
                "ffn.experts.mlp.v1": ("layers.e_up", "unstack_experts_t"),
                "ffn.experts.mlp.w2": ("layers.e_down", "unstack_experts"),
            }
        }

    # ------------------------------------------------------------------
    def backbone_forward(
        self, params, kv_pool, fb: ForwardBatch, page_size: int,
        collect_moe: bool = False, moe_mask=None,
    ):
        assert not collect_moe
        c = self.config
        B, E_ = fb.input_ids.shape
        x = params["embed"][fb.input_ids].astype(
            jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        )
        eps = 1e-5
        rope_cs = self._rope_cos_sin(fb)
        qs, ks = self.q_size, self.kv_size
        clip = self.clip_qkv

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            h = ln_nobias(x, lp["norm1"], eps)
            qkv = qmm(h, lp["w_qkv"], "bed,dh->beh")
            if clip:
                qkv = jnp.clip(qkv, -clip, clip)
            q = qkv[..., :qs].reshape(
                B, E_, c.num_attention_heads, c.head_dim
            )
            k = qkv[..., qs:qs + ks].reshape(
                B, E_, c.num_key_value_heads, c.head_dim
            )
            v = qkv[..., qs + ks:].reshape(
                B, E_, c.num_key_value_heads, c.head_dim
            )
            q, k = apply_rope_cs(q, k, *rope_cs)
            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            x = x + qmm(att.reshape(B, E_, qs), lp["wo"], "beh,hd->bed")

            h2 = ln_nobias(x, lp["norm2"], eps)
            flat = h2.reshape(B * E_, c.hidden_size)
            probs = jax.nn.softmax(
                jnp.einsum(
                    "td,de->te", flat.astype(jnp.float32), lp["router"]
                ),
                axis=-1,
            )
            weights, ids = jax.lax.top_k(probs, self.top_k)
            if self.norm_p is not None:
                scale = jnp.sum(
                    jnp.abs(weights) ** self.norm_p, axis=-1, keepdims=True
                ) ** (1.0 / self.norm_p)
                weights = weights / scale
            moe = moe_apply(
                flat, lp["e_gate"], lp["e_up"], lp["e_down"],
                weights, ids.astype(jnp.int32),
            )
            x = x + moe.reshape(B, E_, c.hidden_size)
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        x = ln_nobias(x, params["final_norm"], eps)
        return x, new_kv


ENTRY_CLASS = DbrxForCausalLM
