"""XVERSE-MoE decoder.

Counterpart of the reference's `srt/models/xverse_moe.py:1`: the
Qwen-MoE-class scan trunk with XVERSE field/key names — experts of width
`intermediate_size` routed by `mlp.router` (top `moe_top_k` of
`num_experts`, softmax, renormalize per `norm_topk_prob`, default False —
reference `xverse_moe.py:176`), plus `num_shared_experts` shared experts
added WITHOUT a gate (`xverse_moe.py:181`).  Every layer is MoE."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.qwen_moe import QwenMoeForCausalLM


class XverseMoeForCausalLM(QwenMoeForCausalLM):
    shared_gate = False  # shared-expert output adds ungated

    def __init__(self, config: ModelConfig, attn_backend=None):
        hf = config.hf_config
        # normalize XVERSE names onto the qwen-moe fields the parent reads
        hf.setdefault("num_experts", hf.get("num_experts", 0))
        hf.setdefault("num_experts_per_tok", hf.get("moe_top_k", 2))
        hf.setdefault("moe_intermediate_size", hf.get("intermediate_size"))
        hf.setdefault("norm_topk_prob", bool(hf.get("norm_topk_prob", False)))
        if hf.get("num_shared_experts"):
            hf.setdefault(
                "shared_expert_intermediate_size",
                hf["intermediate_size"] * hf["num_shared_experts"],
            )
        super().__init__(config, attn_backend)

    def param_shapes(self):
        shapes = super().param_shapes()
        # ungated shared experts: drop the sigmoid gate weight
        shapes["layers"].pop("s_gate_w", None)
        return shapes

    def param_shardings(self):
        specs = super().param_shardings()
        specs["layers"].pop("s_gate_w", None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        per_layer.pop("mlp.gate.weight", None)
        per_layer.pop("mlp.shared_expert_gate.weight", None)
        per_layer["mlp.router.weight"] = ("layers.router", "transpose")
        # shared experts spelled plural
        for hf_n, ours in (
            ("gate_proj", "s_gate"), ("up_proj", "s_up"), ("down_proj", "s_down"),
        ):
            per_layer.pop(f"mlp.shared_expert.{hf_n}.weight", None)
            if self.shared_inter:
                per_layer[f"mlp.shared_experts.{hf_n}.weight"] = (
                    f"layers.{ours}", "transpose",
                )
        return top, per_layer


ENTRY_CLASS = XverseMoeForCausalLM
