"""Phi-3 family decoder.

Counterpart of the reference's `srt/models/phi3.py` (behavioral spec: HF
`modeling_phi3.py`): the Llama trunk with FUSED projections — one
``qkv_proj`` ([q|k|v] rows) and one ``gate_up_proj`` ([gate|up] rows) —
standard full-head-dim neox rope, RMSNorm, no biases.  Long-rope (su)
scaled 128k variants are rejected until the scaling lands; the base 4k
rope serves the common mini/medium configs.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import apply_rope_cs, rms_norm
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM


class Phi3ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        rs = (config.rope_scaling or {}).get("rope_type") or (
            config.rope_scaling or {}
        ).get("type")
        if rs in ("longrope", "su"):
            raise ValueError(
                "Phi-3 longrope scaling is not supported yet; serve the "
                "4k-context config"
            )
        super().__init__(config, attn_backend)

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, D, F = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        layers = shapes["layers"]
        for k in ("wq", "wk", "wv", "w_gate", "w_up"):
            del layers[k]
        layers["w_qkv"] = ((L, D, self.q_size + 2 * self.kv_size), dt)
        layers["w_gateup"] = ((L, D, 2 * F), dt)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        layers = specs["layers"]
        for k in ("wq", "wk", "wv", "w_gate", "w_up"):
            del layers[k]
        # fused q|k|v and gate|up: column-sharding would split across the
        # fusion boundaries; keep unsharded until a split layout lands
        layers["w_qkv"] = P(None, None, None)
        layers["w_gateup"] = P(None, None, None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        for k in list(per_layer):
            if k.startswith(("self_attn.q_proj", "self_attn.k_proj",
                             "self_attn.v_proj", "mlp.gate_proj",
                             "mlp.up_proj")):
                del per_layer[k]
        per_layer["self_attn.qkv_proj.weight"] = ("layers.w_qkv", "transpose")
        per_layer["mlp.gate_up_proj.weight"] = ("layers.w_gateup", "transpose")
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
        if fb.input_embeds is not None:
            # multimodal (phi4mm): placeholder rows replaced by tower rows
            x = jnp.where(
                fb.embed_mask[..., None], fb.input_embeds.astype(x.dtype), x
            )
        eps = c.rms_norm_eps
        rope_cs = self._rope_cos_sin(fb)
        qs, ks = self.q_size, self.kv_size

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            h = rms_norm(x, lp["input_norm"], eps)
            qkv = qmm(h, lp["w_qkv"], "bed,dh->beh")
            q = qkv[..., :qs].reshape(B, E, c.num_attention_heads, c.head_dim)
            k = qkv[..., qs:qs + ks].reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            v = qkv[..., qs + ks:].reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            q, k = apply_rope_cs(q, k, *rope_cs)
            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            x = x + qmm(
                att.reshape(B, E, qs), lp["wo"], "beh,hd->bed"
            )
            h2 = rms_norm(x, lp["post_norm"], eps)
            gu = qmm(h2, lp["w_gateup"], "bed,df->bef")
            gate, up = jnp.split(gu, 2, axis=-1)
            mlp = qmm(
                up * jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype),
                lp["w_down"], "bef,fd->bed",
            )
            x = x + mlp
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        x = rms_norm(x, params["final_norm"], eps)
        return x, new_kv


ENTRY_CLASS = Phi3ForCausalLM
