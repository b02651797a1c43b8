"""GraniteMoe decoder (IBM granite-3 MoE class).

Counterpart of the reference's `srt/models/granitemoe.py` (behavioral
spec: HF `modeling_granitemoe.py`): the Granite multiplier trunk
(embedding / residual / attention / logits multipliers) with every MLP
replaced by a ScatterMoE-layout mixture: ``router.layer`` logits → top-k
THEN softmax over the picked logits (`GraniteMoeTopKGating`), fused
``input_linear`` [E, 2F, D] whose halves are gate/up, silu-GLU, and
``output_linear`` combine scaled by the gate weights.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.granite import GraniteForCausalLM


def granitemoe_experts(
    x,  # [T, D]
    gate_up,  # [E, D, 2F] (half-split: gate first, up second)
    down,  # [E, F, D]
    weights,  # [T, K] softmax over the top-k logits
    expert_ids,  # [T, K] i32
):
    """Dropless grouped compute, combine-weighted at the output."""
    T, D = x.shape
    E = gate_up.shape[0]
    top_k = expert_ids.shape[-1]
    flat = expert_ids.reshape(-1)
    order = jnp.argsort(flat)
    token_idx = order // top_k
    sorted_x = x[token_idx]
    group_sizes = jnp.bincount(flat, length=E)

    gu = jax.lax.ragged_dot(sorted_x, gate_up, group_sizes)
    gate, up = jnp.split(gu, 2, axis=-1)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    out_sorted = jax.lax.ragged_dot(act, down, group_sizes)

    out_flat = jnp.zeros((T * top_k, D), out_sorted.dtype).at[order].set(
        out_sorted
    )
    out = out_flat.reshape(T, top_k, D) * weights[..., None].astype(
        out_sorted.dtype
    )
    return out.sum(axis=1).astype(x.dtype)


class GraniteMoeForCausalLM(GraniteForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.num_experts = hf.get("num_local_experts", 0)
        self.top_k = hf.get("num_experts_per_tok", 2)

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, D, F = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        E = self.num_experts
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        layers = shapes["layers"]
        for k in ("w_gate", "w_up", "w_down"):
            del layers[k]
        layers["router"] = ((L, D, E), jnp.float32)
        layers["e_gateup"] = ((L, E, D, 2 * F), dt)
        layers["e_down"] = ((L, E, F, D), dt)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        layers = specs["layers"]
        for k in ("w_gate", "w_up", "w_down"):
            del layers[k]
        layers["router"] = P(None, None, None)
        # half-split 2F can't column-shard across the gate/up boundary;
        # shard the expert dim
        layers["e_gateup"] = P(None, "model", None, None)
        layers["e_down"] = P(None, "model", None, None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        for k in list(per_layer):
            if k.startswith("mlp."):
                del per_layer[k]
        per_layer["block_sparse_moe.router.layer.weight"] = (
            "layers.router", "transpose",
        )
        per_layer["block_sparse_moe.input_linear.weight"] = (
            "layers.e_gateup", "transpose_last2",
        )
        per_layer["block_sparse_moe.output_linear.weight"] = (
            "layers.e_down", "transpose_last2",
        )
        return top, per_layer

    def _mlp(self, h, lp, proj=None, collect_stats=False, stats_mask=None):
        B, E_, D = h.shape
        flat = h.reshape(B * E_, D)
        logits = jnp.einsum(
            "td,de->te", flat.astype(jnp.float32), lp["router"]
        )
        vals, ids = jax.lax.top_k(logits, self.top_k)
        weights = jax.nn.softmax(vals, axis=-1)
        out = granitemoe_experts(
            flat, lp["e_gateup"], lp["e_down"], weights,
            ids.astype(jnp.int32),
        ).reshape(B, E_, D)
        if collect_stats:
            from sglang_npu_tpu.layers.moe import routing_counts

            return out, routing_counts(
                ids.astype(jnp.int32), self.num_experts, stats_mask
            )
        return out


ENTRY_CLASS = GraniteMoeForCausalLM
