"""Qwen2-MoE / Qwen3-MoE / Mixtral decoder models.

Counterpart of the reference's `srt/models/qwen2_moe.py`, `qwen3_moe.py`,
`mixtral.py`: the Llama-family trunk with the dense MLP replaced by a
routed MoE (`layers/moe.py`), plus Qwen2-MoE's shared expert with sigmoid
gate.  Expert weights are stacked [L, E, ...] so the layer scan stays a
single trace; under TP the expert FFN dims shard on the "model" axis
(expert-parallel placement lands with the `expert` mesh axis in a later
round — reference `ep_moe/`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.moe import moe_mlp
from sglang_npu_tpu.models.llama import LlamaForCausalLM


class QwenMoeForCausalLM(LlamaForCausalLM):
    """Covers Qwen2MoeForCausalLM / Qwen3MoeForCausalLM / MixtralForCausalLM."""

    ep_size = 1  # >1: expert-parallel placement (set by ModelRunner)
    ep_mesh = None
    # EPLB (reference `srt/eplb/`): extra physical expert slots for
    # redundant replicas of hot experts; weight arrays are sized
    # [L, E + num_redundant, ...] and routed through l2p/rc tables.
    num_redundant = 0

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.num_experts = (
            hf.get("num_experts")
            or hf.get("num_local_experts")  # mixtral
            or 0
        )
        self.top_k = hf.get("num_experts_per_tok", 2)
        self.moe_inter = hf.get("moe_intermediate_size") or hf.get(
            "intermediate_size"
        )
        self.norm_topk = hf.get("norm_topk_prob", True)
        self.shared_inter = hf.get("shared_expert_intermediate_size", 0) or 0
        assert self.num_experts > 0, "MoE model without experts?"

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, Dm = c.num_hidden_layers, c.hidden_size
        E, F = self.num_experts, self.moe_inter
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        layers = shapes["layers"]
        for k in ("w_gate", "w_up", "w_down"):
            del layers[k]
        P_slots = E + self.num_redundant  # physical expert slots (EPLB)
        layers["router"] = ((L, Dm, E), jnp.float32)
        layers["e_gate"] = ((L, P_slots, Dm, F), dt)
        layers["e_up"] = ((L, P_slots, Dm, F), dt)
        layers["e_down"] = ((L, P_slots, F, Dm), dt)
        if self.shared_inter:
            layers["s_gate"] = ((L, Dm, self.shared_inter), dt)
            layers["s_up"] = ((L, Dm, self.shared_inter), dt)
            layers["s_down"] = ((L, self.shared_inter, Dm), dt)
            layers["s_gate_w"] = ((L, Dm), dt)  # sigmoid shared-expert gate
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        layers = specs["layers"]
        for k in ("w_gate", "w_up", "w_down"):
            del layers[k]
        layers["router"] = P(None, None, None)
        if self.ep_size > 1:
            # EP: experts shard over the model axis (weight memory and
            # streaming divide by ep); F stays unsharded per-expert
            layers["e_gate"] = P(None, "model", None, None)
            layers["e_up"] = P(None, "model", None, None)
            layers["e_down"] = P(None, "model", None, None)
        else:
            layers["e_gate"] = P(None, None, None, "model")
            layers["e_up"] = P(None, None, None, "model")
            layers["e_down"] = P(None, None, "model", None)
        if self.shared_inter:
            layers["s_gate"] = P(None, None, "model")
            layers["s_up"] = P(None, None, "model")
            layers["s_down"] = P(None, "model", None)
            layers["s_gate_w"] = P(None, None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        for k in list(per_layer):
            if k.startswith("mlp."):
                del per_layer[k]
        per_layer["mlp.gate.weight"] = ("layers.router", "transpose")
        # mixtral names the router "block_sparse_moe.gate"
        per_layer["block_sparse_moe.gate.weight"] = ("layers.router", "transpose")
        if self.shared_inter:
            per_layer["mlp.shared_expert.gate_proj.weight"] = (
                "layers.s_gate",
                "transpose",
            )
            per_layer["mlp.shared_expert.up_proj.weight"] = (
                "layers.s_up",
                "transpose",
            )
            per_layer["mlp.shared_expert.down_proj.weight"] = (
                "layers.s_down",
                "transpose",
            )
            per_layer["mlp.shared_expert_gate.weight"] = ("layers.s_gate_w", "squeeze")
        # per-expert weights: handled by the loader via the expert pattern
        for e in range(self.num_experts):
            per_layer[f"mlp.experts.{e}.gate_proj.weight"] = (
                f"layers.e_gate.__expert__{e}",
                "transpose",
            )
            per_layer[f"mlp.experts.{e}.up_proj.weight"] = (
                f"layers.e_up.__expert__{e}",
                "transpose",
            )
            per_layer[f"mlp.experts.{e}.down_proj.weight"] = (
                f"layers.e_down.__expert__{e}",
                "transpose",
            )
            # mixtral: w1=gate, w3=up, w2=down
            per_layer[f"block_sparse_moe.experts.{e}.w1.weight"] = (
                f"layers.e_gate.__expert__{e}",
                "transpose",
            )
            per_layer[f"block_sparse_moe.experts.{e}.w3.weight"] = (
                f"layers.e_up.__expert__{e}",
                "transpose",
            )
            per_layer[f"block_sparse_moe.experts.{e}.w2.weight"] = (
                f"layers.e_down.__expert__{e}",
                "transpose",
            )
        return top, per_layer

    # ------------------------------------------------------------------
    # EPLB hooks (reference `srt/eplb/eplb_manager.py`,
    # `expert_location.py:update_expert_weights`)
    # ------------------------------------------------------------------
    def eplb_layer_count(self) -> int:
        """Number of MoE layers (stats rows / placement rows)."""
        return self.config.num_hidden_layers

    def eplb_install_tables(self, params, l2p, rc):
        """Insert the logical->physical routing tables into the stacked
        layer params so the layer scan slices them per layer."""
        params = dict(params)
        params["layers"] = {
            **params["layers"],
            "eplb_l2p": l2p,  # [L, E, R] i32
            "eplb_rc": rc,  # [L, E] i32
        }
        return params

    def eplb_permute(self, params, gather, l2p, rc):
        """Apply a new placement: permute every expert-stacked weight along
        the physical-slot dim (``gather[l, p]`` = current slot to copy into
        new slot p — one gather per leaf, quantized pytrees included) and
        swap the routing tables."""
        layers = dict(params["layers"])
        for k in ("e_gate", "e_up", "e_down"):
            layers[k] = jax.tree.map(
                lambda a: jax.device_put(
                    jnp.take_along_axis(
                        a,
                        gather.reshape(
                            gather.shape + (1,) * (a.ndim - 2)
                        ).astype(jnp.int32),
                        axis=1,
                    ),
                    a.sharding,
                ),
                layers[k],
            )
        layers["eplb_l2p"] = jax.device_put(l2p, layers["eplb_l2p"].sharding)
        layers["eplb_rc"] = jax.device_put(rc, layers["eplb_rc"].sharding)
        params = dict(params)
        params["layers"] = layers
        return params

    # ------------------------------------------------------------------
    def _mlp(self, h, lp, proj=None, collect_stats=False, stats_mask=None):
        from sglang_npu_tpu.layers.quantization import dequant
        from sglang_npu_tpu.layers.quantization import matmul as qmm

        B, E_, Dm = h.shape
        flat = h.reshape(B * E_, Dm)
        stats = None
        if self.ep_size > 1:
            from sglang_npu_tpu.layers.moe import ep_moe

            out = ep_moe(
                flat,
                lp["router"].astype(flat.dtype),
                dequant(lp["e_gate"], flat.dtype),
                dequant(lp["e_up"], flat.dtype),
                dequant(lp["e_down"], flat.dtype),
                top_k=self.top_k,
                norm_topk_prob=self.norm_topk,
                mesh=self.ep_mesh,
                l2p=lp.get("eplb_l2p"),
                rc=lp.get("eplb_rc"),
                collect_stats=collect_stats,
                stats_mask=stats_mask,
            )
        else:
            out = moe_mlp(
                flat,
                lp["router"].astype(flat.dtype),
                dequant(lp["e_gate"], flat.dtype),
                dequant(lp["e_up"], flat.dtype),
                dequant(lp["e_down"], flat.dtype),
                top_k=self.top_k,
                norm_topk_prob=self.norm_topk,
                collect_stats=collect_stats,
                stats_mask=stats_mask,
                activation=getattr(self, "moe_act", "silu"),
                router_softcap=getattr(self, "router_softcap", 0.0),
            )
        if collect_stats:
            out, stats = out
        if self.shared_inter:
            gate = qmm(flat, lp["s_gate"], "td,df->tf")
            up = qmm(flat, lp["s_up"], "td,df->tf")
            shared = qmm(jax.nn.silu(gate) * up, lp["s_down"], "tf,fd->td")
            if getattr(self, "shared_gate", True):
                sg = jax.nn.sigmoid(
                    jnp.einsum("td,d->t", flat, lp["s_gate_w"])
                )[:, None]
                shared = sg.astype(shared.dtype) * shared
            out = out + shared
        out = out.reshape(B, E_, Dm)
        return (out, stats) if collect_stats else out
