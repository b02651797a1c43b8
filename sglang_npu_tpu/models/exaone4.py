"""EXAONE-4 decoder (LG AI).

Counterpart of the reference's `srt/models/exaone.py` family (behavioral
spec: HF `modeling_exaone4.py`): PURE post-norm blocks — attention reads
the raw residual stream, its output is RMS-normed BEFORE the residual
add, and likewise for the MLP (no input norms at all); per-head-dim qk
RMS norm before rope; and a 3:1 sliding/full hybrid where ROPE IS ONLY
APPLIED ON SLIDING LAYERS (global layers are NoPE) whenever a sliding
window is configured.  Expressed as traced per-layer window + rope
flags in the stacked-layer scan (full pool with window masking; the
gemma-class hybrid ring pool is a later opt-in via
``supports_hybrid_swa``).
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
from sglang_npu_tpu.ops.xla_attention import paged_attention_xla, write_kv


class Exaone4ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        c = config
        sl = c.swa_layers
        sw = c.sliding_window or 0
        L = c.num_hidden_layers
        if sl is None:
            sl = [False] * L
        self.windows = jnp.asarray(
            [sw if s else (1 << 30) for s in sl], jnp.int32
        )
        # rope only on sliding layers when a window exists; everywhere
        # otherwise (HF: `if self.sliding_window is None or self.is_sliding`)
        self.rope_on = jnp.asarray(
            [1.0 if (not sw or s) else 0.0 for s in sl], jnp.float32
        )

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L = c.num_hidden_layers
        layers = shapes["layers"]
        # post-norm pair replaces the pre-norm pair; same shapes, renamed
        # destinations keep the HF names obvious
        layers["q_norm"] = ((L, c.head_dim), jnp.float32)
        layers["k_norm"] = ((L, c.head_dim), jnp.float32)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["layers"]["q_norm"] = P(None, None)
        specs["layers"]["k_norm"] = P(None, None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        # input_norm slot holds post_attention, post_norm slot holds
        # post_feedforward
        per_layer.pop("input_layernorm.weight", None)
        per_layer.pop("post_attention_layernorm.weight", None)
        per_layer["post_attention_layernorm.weight"] = (
            "layers.input_norm", None,
        )
        per_layer["post_feedforward_layernorm.weight"] = (
            "layers.post_norm", None,
        )
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
        eps = c.rms_norm_eps
        rope_cs = self._rope_cos_sin(fb)

        def layer_fn(carry, xs):
            x, kv_pool, l = carry
            lp, window, use_rope = xs
            # post-norm: attention reads the RAW residual stream
            q = qmm(x, lp["wq"], "bed,dh->beh").reshape(
                B, E, c.num_attention_heads, c.head_dim
            )
            k = qmm(x, lp["wk"], "bed,dh->beh").reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            v = qmm(x, lp["wv"], "bed,dh->beh").reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            q = rms_norm(q, lp["q_norm"], eps)
            k = rms_norm(k, lp["k_norm"], eps)
            qr, kr = apply_rope_cs(q, k, *rope_cs)
            q = jnp.where(use_rope > 0, qr, q)
            k = jnp.where(use_rope > 0, kr, k)
            kv_pool = write_kv(kv_pool, l, k, v, fb.out_slots)
            att = paged_attention_xla(
                q, kv_pool, l, fb.page_tables, fb.seq_lens, fb.positions,
                page_size, self.scale, sliding_window=window,
            )
            att_out = qmm(
                att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed"
            )
            x = x + rms_norm(att_out, lp["input_norm"], eps)

            g = qmm(x, lp["w_gate"], "bed,df->bef")
            u = qmm(x, lp["w_up"], "bed,df->bef")
            mlp_out = qmm(jax.nn.silu(g) * u, lp["w_down"], "bef,fd->bed")
            x = x + rms_norm(mlp_out, lp["post_norm"], eps)
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)),
            (params["layers"], self.windows, self.rope_on),
        )
        x = rms_norm(x, params["final_norm"], eps)
        return x, new_kv


ENTRY_CLASS = Exaone4ForCausalLM
