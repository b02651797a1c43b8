"""HunYuan-V1 dense decoder (Tencent).

Counterpart of the reference's `srt/models/hunyuan.py` (behavioral spec:
HF `modeling_hunyuan_v1_dense.py`): the Llama trunk with per-head-dim
qk RMS norm applied AFTER rope (``query_layernorm``/``key_layernorm``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.models.llama import LlamaForCausalLM


class HunYuanDenseV1ForCausalLM(LlamaForCausalLM):
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        L = self.config.num_hidden_layers
        hd = self.config.head_dim
        shapes["layers"]["q_norm_post"] = ((L, hd), jnp.float32)
        shapes["layers"]["k_norm_post"] = ((L, hd), jnp.float32)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["layers"]["q_norm_post"] = P(None, None)
        specs["layers"]["k_norm_post"] = P(None, None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        per_layer["self_attn.query_layernorm.weight"] = (
            "layers.q_norm_post", None,
        )
        per_layer["self_attn.key_layernorm.weight"] = (
            "layers.k_norm_post", None,
        )
        return top, per_layer


ENTRY_CLASS = HunYuanDenseV1ForCausalLM
