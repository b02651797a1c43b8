"""Persimmon decoder (Adept persimmon-8b).

Counterpart of the reference's `srt/models/persimmon.py` (behavioral
spec: HF `modeling_persimmon.py`): fused ``query_key_value`` whose heads
INTERLEAVE q/k/v ([H, 3, hd] per token), a single shared biased
LayerNorm on q and k (``qk_layernorm``) before the 0.5-partial rotary,
biased relu² MLP (``dense_h_to_4h``/``dense_4h_to_h``), and biased
LayerNorm blocks.
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


class PersimmonForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.ln_eps = hf.get("layer_norm_eps", 1e-5)
        self.rot_dims = int(
            config.head_dim * hf.get("partial_rotary_factor", 0.5)
        )
        self.qk_layernorm = hf.get("qk_layernorm", True)
        self.rope = make_rope_tables(
            self.rot_dims,
            max(config.context_length, config.max_position_embeddings),
            config.rope_theta,
            config.rope_scaling,
        )

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, D, F = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        hd = c.head_dim
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        shapes: Dict[str, Any] = {
            "embed": ((c.vocab_size, D), dt),
            "final_norm": ((D,), jnp.float32),
            "final_norm_b": ((D,), jnp.float32),
            "lm_head": ((D, c.vocab_size), dt),
            "layers": {
                "input_norm": ((L, D), jnp.float32),
                "input_norm_b": ((L, D), jnp.float32),
                "post_norm": ((L, D), jnp.float32),
                "post_norm_b": ((L, D), jnp.float32),
                "w_qkv": ((L, D, 3 * D), dt),
                "b_qkv": ((L, 3 * D), dt),
                "wo": ((L, D, D), dt),
                "bo": ((L, D), dt),
                "fc1": ((L, D, F), dt),
                "b_fc1": ((L, F), dt),
                "fc2": ((L, F, D), dt),
                "b_fc2": ((L, D), dt),
            },
        }
        if self.qk_layernorm:
            for k in ("q_norm", "q_norm_b", "k_norm", "k_norm_b"):
                shapes["layers"][k] = ((L, hd), jnp.float32)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs: Dict[str, Any] = {
            "embed": P(None, "model"),
            "final_norm": P(None),
            "final_norm_b": P(None),
            "lm_head": P(None, "model"),
            "layers": {
                "input_norm": P(None, None),
                "input_norm_b": P(None, None),
                "post_norm": P(None, None),
                "post_norm_b": P(None, None),
                "w_qkv": P(None, None, None),
                "b_qkv": P(None, None),
                "wo": P(None, "model", None),
                "bo": P(None, None),
                "fc1": P(None, None, "model"),
                "b_fc1": P(None, "model"),
                "fc2": P(None, "model", None),
                "b_fc2": P(None, None),
            },
        }
        if self.qk_layernorm:
            for k in ("q_norm", "q_norm_b", "k_norm", "k_norm_b"):
                specs["layers"][k] = P(None, None)
        return specs

    def hf_weight_map(self):
        top = {
            "model.embed_tokens.weight": ("embed", None),
            "model.final_layernorm.weight": ("final_norm", None),
            "model.final_layernorm.bias": ("final_norm_b", None),
            "lm_head.weight": ("lm_head", "transpose"),
        }
        per_layer = {
            "input_layernorm.weight": ("layers.input_norm", None),
            "input_layernorm.bias": ("layers.input_norm_b", None),
            "post_attention_layernorm.weight": ("layers.post_norm", None),
            "post_attention_layernorm.bias": ("layers.post_norm_b", None),
            "self_attn.query_key_value.weight": ("layers.w_qkv", "transpose"),
            "self_attn.query_key_value.bias": ("layers.b_qkv", None),
            "self_attn.dense.weight": ("layers.wo", "transpose"),
            "self_attn.dense.bias": ("layers.bo", None),
            "mlp.dense_h_to_4h.weight": ("layers.fc1", "transpose"),
            "mlp.dense_h_to_4h.bias": ("layers.b_fc1", None),
            "mlp.dense_4h_to_h.weight": ("layers.fc2", "transpose"),
            "mlp.dense_4h_to_h.bias": ("layers.b_fc2", None),
        }
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
        H, hd = c.num_attention_heads, c.head_dim

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            h = layer_norm(x, lp["input_norm"], lp["input_norm_b"], eps)
            qkv = qmm(h, lp["w_qkv"], "bed,dh->beh") + lp["b_qkv"]
            # per-head interleaved fused layout [H, 3, hd]
            qkv = qkv.reshape(B, E, H, 3, hd)
            q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
            if self.qk_layernorm:
                q = layer_norm(q, lp["q_norm"], lp["q_norm_b"], eps)
                k = layer_norm(k, lp["k_norm"], lp["k_norm_b"], eps)
            q, k = rope_partial(q, k, *rope_cs, self.rot_dims)
            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            x = x + (
                qmm(att.reshape(B, E, H * hd), lp["wo"], "beh,hd->bed")
                + lp["bo"]
            )
            h2 = layer_norm(x, lp["post_norm"], lp["post_norm_b"], eps)
            h2 = qmm(h2, lp["fc1"], "bed,df->bef") + lp["b_fc1"]
            h2 = jnp.square(jax.nn.relu(h2.astype(jnp.float32))).astype(
                x.dtype
            )
            x = x + (qmm(h2, lp["fc2"], "bef,fd->bed") + lp["b_fc2"])
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        x = layer_norm(x, params["final_norm"], params["final_norm_b"], eps)
        return x, new_kv


ENTRY_CLASS = PersimmonForCausalLM
