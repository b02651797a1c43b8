"""OLMoE decoder (AI2 open MoE).

Counterpart of the reference's `srt/models/olmoe.py` (behavioral spec:
HF `modeling_olmoe.py`): the mixtral-style softmax-then-top-k MoE trunk
(`qwen_moe.py`) plus RMS norms over the FULL projected q/k widths before
the head reshape (`OlmoeAttention.q_norm/k_norm`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.models.qwen_moe import QwenMoeForCausalLM


class OlmoeForCausalLM(QwenMoeForCausalLM):
    def __init__(self, config, attn_backend=None):
        super().__init__(config, attn_backend)
        # OlmoeConfig defaults norm_topk_prob to False (HF omits
        # default-valued keys, and the qwen-moe default is True)
        self.norm_topk = config.hf_config.get("norm_topk_prob", False)

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L = c.num_hidden_layers
        kv_size = c.num_key_value_heads * c.head_dim
        shapes["layers"]["q_norm_full"] = ((L, self.q_size), jnp.float32)
        shapes["layers"]["k_norm_full"] = ((L, kv_size), jnp.float32)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["layers"]["q_norm_full"] = P(None, "model")
        specs["layers"]["k_norm_full"] = P(None, None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        per_layer["self_attn.q_norm.weight"] = ("layers.q_norm_full", None)
        per_layer["self_attn.k_norm.weight"] = ("layers.k_norm_full", None)
        return top, per_layer


ENTRY_CLASS = OlmoeForCausalLM
