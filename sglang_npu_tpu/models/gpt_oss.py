"""gpt-oss decoder (OpenAI open-weight MoE).

Counterpart of the reference's `srt/models/gpt_oss.py` (behavioral spec:
HF `modeling_gpt_oss.py`):

  * attention SINKS: each head carries a learned sink logit included in
    the softmax denominator (heads can abstain) — `ops/xla_attention.py`
    sinks path
  * alternating sliding/full attention by `layer_types`, expressed as a
    traced per-layer window so the stacked-layer scan stays one trace
  * every layer is MoE: biased router, top-k THEN softmax over the picked
    logits, experts with fused INTERLEAVED gate/up (+ biases), clamped
    gate/up and `gate*sigmoid(1.702*gate)*(up+1)` activation, biased down
  * YaRN rope, qkv/o biases.
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

ALPHA = 1.702
LIMIT = 7.0


def gpt_oss_experts(
    x,  # [T, D]
    gate_up,  # [E, D, 2F] (interleaved gate/up columns)
    gate_up_b,  # [E, 2F]
    down,  # [E, F, D]
    down_b,  # [E, D]
    weights,  # [T, K]
    expert_ids,  # [T, K] i32
):
    """Dropless grouped compute with per-expert biases and the gpt-oss
    clamped-GLU activation."""
    T, D = x.shape
    E = gate_up.shape[0]
    top_k = expert_ids.shape[-1]
    flat = expert_ids.reshape(-1)
    order = jnp.argsort(flat)
    token_idx = order // top_k
    sorted_x = x[token_idx]
    sorted_e = flat[order]
    group_sizes = jnp.bincount(flat, length=E)

    gu = jax.lax.ragged_dot(sorted_x, gate_up, group_sizes)
    gu = gu + gate_up_b[sorted_e]
    gate, up = gu[..., 0::2], gu[..., 1::2]
    gate = jnp.minimum(gate.astype(jnp.float32), LIMIT)
    up = jnp.clip(up.astype(jnp.float32), -LIMIT, LIMIT)
    glu = gate * jax.nn.sigmoid(gate * ALPHA)
    act = ((up + 1.0) * glu).astype(x.dtype)
    out_sorted = jax.lax.ragged_dot(act, down, group_sizes)
    out_sorted = out_sorted + down_b[sorted_e]

    out_flat = jnp.zeros((T * top_k, D), out_sorted.dtype).at[order].set(
        out_sorted
    )
    out = out_flat.reshape(T, top_k, D) * weights[..., None].astype(
        out_sorted.dtype
    )
    return out.sum(axis=1).astype(x.dtype)


class GptOssForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.num_experts = hf.get("num_local_experts", 0)
        self.top_k = hf.get("num_experts_per_tok", 4)
        self.sw = hf.get("sliding_window") or 0
        lt = hf.get("layer_types") or []
        self.is_sliding = [t == "sliding_attention" for t in lt] or [
            False
        ] * config.num_hidden_layers

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, D, F = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        E = self.num_experts
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        layers = shapes["layers"]
        for k in ("w_gate", "w_up", "w_down"):
            del layers[k]
        layers["bo"] = ((L, D), dt)
        layers["sinks"] = ((L, c.num_attention_heads), jnp.float32)
        layers["router"] = ((L, D, E), jnp.float32)
        layers["router_b"] = ((L, E), jnp.float32)
        layers["e_gateup"] = ((L, E, D, 2 * F), dt)
        layers["e_gateup_b"] = ((L, E, 2 * F), dt)
        layers["e_down"] = ((L, E, F, D), dt)
        layers["e_down_b"] = ((L, E, D), dt)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        layers = specs["layers"]
        for k in ("w_gate", "w_up", "w_down"):
            del layers[k]
        layers["bo"] = P(None, None)
        layers["sinks"] = P(None, None)
        layers["router"] = P(None, None, None)
        layers["router_b"] = P(None, None)
        # interleaved gate/up columns: shard experts nowhere for now (the
        # 2F interleave would split pairs); down F-dim shards cleanly
        layers["e_gateup"] = P(None, None, None, None)
        layers["e_gateup_b"] = P(None, None, None)
        layers["e_down"] = P(None, None, None, None)
        layers["e_down_b"] = P(None, None, None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        for k in ("mlp.gate_proj.weight", "mlp.up_proj.weight",
                  "mlp.down_proj.weight"):
            per_layer.pop(k, None)
        per_layer.update({
            "self_attn.o_proj.bias": ("layers.bo", None),
            "self_attn.sinks": ("layers.sinks", None),
            "mlp.router.weight": ("layers.router", "transpose"),
            "mlp.router.bias": ("layers.router_b", None),
            # HF stores these as raw [E, D, 2F]/[E, F, D] parameters —
            # already our orientation, no transpose
            "mlp.experts.gate_up_proj": ("layers.e_gateup", None),
            "mlp.experts.gate_up_proj_bias": ("layers.e_gateup_b", None),
            "mlp.experts.down_proj": ("layers.e_down", None),
            "mlp.experts.down_proj_bias": ("layers.e_down_b", None),
        })
        return top, per_layer

    # ------------------------------------------------------------------
    def backbone_forward(
        self, params, kv_pool, fb: ForwardBatch, page_size: int,
        collect_moe: bool = False, moe_mask=None,
    ):
        assert not collect_moe
        c = self.config
        B, E_ = fb.input_ids.shape
        x = params["embed"][fb.input_ids].astype(
            jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        )
        eps = c.rms_norm_eps
        rope_cs = self._rope_cos_sin(fb)
        # traced per-layer window: sliding layers mask, full layers get an
        # effectively-infinite window (gemma-2 alternating pattern)
        windows = jnp.asarray(
            [self.sw if s else (1 << 30) for s in self.is_sliding],
            jnp.int32,
        )

        def layer_fn(carry, xs):
            (x, kv_pool, l) = carry
            lp, window = xs
            h = rms_norm(x, lp["input_norm"], eps)
            q = qmm(h, lp["wq"], "bed,dh->beh") + lp["bq"]
            k = qmm(h, lp["wk"], "bed,dh->beh") + lp["bk"]
            v = qmm(h, lp["wv"], "bed,dh->beh") + lp["bv"]
            q = q.reshape(B, E_, c.num_attention_heads, c.head_dim)
            k = k.reshape(B, E_, c.num_key_value_heads, c.head_dim)
            v = v.reshape(B, E_, c.num_key_value_heads, c.head_dim)
            q, k = apply_rope_cs(q, k, *rope_cs)
            kv_pool = write_kv(kv_pool, l, k, v, fb.out_slots)
            att = paged_attention_xla(
                q, kv_pool, l, fb.page_tables, fb.seq_lens, fb.positions,
                page_size, self.scale, sliding_window=window,
                sinks=lp["sinks"],
            )
            x = x + (
                qmm(att.reshape(B, E_, self.q_size), lp["wo"], "beh,hd->bed")
                + lp["bo"]
            )

            h2 = rms_norm(x, lp["post_norm"], eps)
            flat = h2.reshape(B * E_, c.hidden_size)
            logits = (
                jnp.einsum(
                    "td,de->te", flat.astype(jnp.float32), lp["router"]
                )
                + lp["router_b"]
            )
            # gpt-oss routing: top-k FIRST, then softmax over the picked
            # logits (HF GptOssTopKRouter)
            vals, ids = jax.lax.top_k(logits, self.top_k)
            weights = jax.nn.softmax(vals, axis=-1)
            moe = gpt_oss_experts(
                flat, lp["e_gateup"], lp["e_gateup_b"],
                lp["e_down"], lp["e_down_b"], weights, ids.astype(jnp.int32),
            )
            x = x + moe.reshape(B, E_, c.hidden_size)
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), (params["layers"], windows)
        )
        x = rms_norm(x, params["final_norm"], eps)
        return x, new_kv


ENTRY_CLASS = GptOssForCausalLM
