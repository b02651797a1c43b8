"""OLMo-2 decoder.

Counterpart of the reference's `srt/models/olmo2.py` (behavioral spec: HF
`modeling_olmo2.py`): llama-shaped projections with two inversions — the
block norms sit AFTER attention/MLP on the sub-layer OUTPUT (no input
norms), and q/k RMSNorms apply over the FLAT projection width
(num_heads*head_dim / num_kv_heads*head_dim) before the head reshape.
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


class Olmo2ForCausalLM(LlamaForCausalLM):
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L = c.num_hidden_layers
        layers = shapes["layers"]
        del layers["input_norm"]  # post-norm architecture
        layers["q_norm_flat"] = ((L, self.q_size), jnp.float32)
        layers["k_norm_flat"] = ((L, self.kv_size), jnp.float32)
        layers["post_ffw_norm"] = ((L, c.hidden_size), jnp.float32)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        layers = specs["layers"]
        del layers["input_norm"]
        layers["q_norm_flat"] = P(None, "model")
        layers["k_norm_flat"] = P(None, "model")
        layers["post_ffw_norm"] = P(None, None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        del per_layer["input_layernorm.weight"]
        per_layer["self_attn.q_norm.weight"] = ("layers.q_norm_flat", None)
        per_layer["self_attn.k_norm.weight"] = ("layers.k_norm_flat", None)
        per_layer["post_feedforward_layernorm.weight"] = (
            "layers.post_ffw_norm", None,
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
        eps = c.rms_norm_eps
        rope_cs = self._rope_cos_sin(fb)

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            # post-norm: projections read the raw residual stream
            q = rms_norm(qmm(x, lp["wq"], "bed,dh->beh"), lp["q_norm_flat"], eps)
            k = rms_norm(qmm(x, lp["wk"], "bed,dh->beh"), lp["k_norm_flat"], eps)
            v = qmm(x, lp["wv"], "bed,dh->beh")
            q = q.reshape(B, E, c.num_attention_heads, c.head_dim)
            k = k.reshape(B, E, c.num_key_value_heads, c.head_dim)
            v = v.reshape(B, E, c.num_key_value_heads, c.head_dim)
            q, k = apply_rope_cs(q, k, *rope_cs)
            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            att = qmm(att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed")
            x = x + rms_norm(att, lp["post_norm"], eps)

            gate = qmm(x, lp["w_gate"], "bed,df->bef")
            up = qmm(x, lp["w_up"], "bed,df->bef")
            mlp = qmm(
                up * jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype),
                lp["w_down"], "bef,fd->bed",
            )
            x = x + rms_norm(mlp, lp["post_ffw_norm"], eps)
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        x = rms_norm(x, params["final_norm"], eps)
        return x, new_kv


ENTRY_CLASS = Olmo2ForCausalLM
