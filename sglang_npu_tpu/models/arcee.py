"""Arcee (AFM) decoder.

Counterpart of the reference's `srt/models/arcee.py` (behavioral spec:
HF `modeling_arcee.py`): the Llama trunk with a GATELESS ReLU² MLP —
``down(relu(up(x))²)`` — instead of SwiGLU.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from sglang_npu_tpu.models.llama import LlamaForCausalLM


class ArceeForCausalLM(LlamaForCausalLM):
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        del shapes["layers"]["w_gate"]
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        del specs["layers"]["w_gate"]
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        per_layer.pop("mlp.gate_proj.weight", None)
        return top, per_layer

    def _mlp(self, h, lp, proj=None, collect_stats=False, stats_mask=None):
        assert not collect_stats
        from sglang_npu_tpu.layers.quantization import matmul as qmm

        if proj is None:
            proj = lambda x, lp_, k, eq: qmm(x, lp_[k], eq)
        u = proj(h, lp, "w_up", "bed,df->bef")
        act = jnp.square(jax.nn.relu(u))
        return proj(act, lp, "w_down", "bef,fd->bed")


ENTRY_CLASS = ArceeForCausalLM
