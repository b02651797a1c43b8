"""EAGLE draft head (hidden-state-conditioned speculative drafts).

Counterpart of the reference's `srt/models/llama_eagle.py` (EAGLE-1) /
`llama_eagle3.py`: a shallow llama-style decoder whose input is
fc(concat(embed(token), previous_target_hidden)) and whose logits reuse
the target's lm_head.  The draft maintains its own (few-layer) paged KV
cache in lockstep slot ids with the target pool.

HF checkpoint layout (yuhuili/EAGLE-* heads): `fc.weight` plus
`layers.N.*` llama decoder tensors; embed/lm_head come from the target.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import apply_rope, make_rope_tables, rms_norm
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.ops.xla_attention import paged_attention_xla, write_kv


class EagleDraftModel:
    """Functional EAGLE draft: scan over (usually one) decoder layers.

    The pytree does NOT include embed/lm_head — the caller passes the
    target's (they are shared, reference `llama_eagle.py` ties them)."""

    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        self.q_size = c.num_attention_heads * c.head_dim
        self.kv_size = c.num_key_value_heads * c.head_dim
        self.scale = c.head_dim**-0.5
        self.rope = make_rope_tables(
            c.head_dim,
            max(c.context_length, c.max_position_embeddings),
            c.rope_theta,
            c.rope_scaling,
        )

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, D, F = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        return {
            "fc": ((2 * D, D), dt),
            "layers": {
                # EAGLE layer 0 has no input_layernorm on the hidden path;
                # we keep one norm slot per layer and set layer-0's to ones
                # at load when the checkpoint omits it.
                "input_norm": ((L, D), jnp.float32),
                "post_norm": ((L, D), jnp.float32),
                "wq": ((L, D, self.q_size), dt),
                "wk": ((L, D, self.kv_size), dt),
                "wv": ((L, D, self.kv_size), dt),
                "wo": ((L, self.q_size, D), dt),
                "w_gate": ((L, D, F), dt),
                "w_up": ((L, D, F), dt),
                "w_down": ((L, F, D), dt),
            },
        }

    def param_shardings(self) -> Dict[str, Any]:
        return {
            "fc": P(None, None),
            "layers": {
                "input_norm": P(None, None),
                "post_norm": P(None, None),
                "wq": P(None, None, "model"),
                "wk": P(None, None, "model"),
                "wv": P(None, None, "model"),
                "wo": P(None, "model", None),
                "w_gate": P(None, None, "model"),
                "w_up": P(None, None, "model"),
                "w_down": P(None, "model", None),
            },
        }

    def hf_weight_map(self):
        m = {"fc.weight": ("fc", "transpose")}
        per_layer = {
            "input_layernorm.weight": ("layers.input_norm", None),
            "hidden_norm.weight": ("layers.input_norm", None),  # eagle3 name
            "post_attention_layernorm.weight": ("layers.post_norm", None),
            "self_attn.q_proj.weight": ("layers.wq", "transpose"),
            "self_attn.k_proj.weight": ("layers.wk", "transpose"),
            "self_attn.v_proj.weight": ("layers.wv", "transpose"),
            "self_attn.o_proj.weight": ("layers.wo", "transpose"),
            "mlp.gate_proj.weight": ("layers.w_gate", "transpose"),
            "mlp.up_proj.weight": ("layers.w_up", "transpose"),
            "mlp.down_proj.weight": ("layers.w_down", "transpose"),
        }
        return m, per_layer

    # ------------------------------------------------------------------
    def make_draft_pool(self, num_pages: int, page_size: int, mesh):
        """Draft KV pool in the target's page/slot space."""
        from jax.sharding import NamedSharding

        c = self.config
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        shape = (
            c.num_hidden_layers, 2, c.num_key_value_heads,
            num_pages, page_size, c.head_dim,
        )
        return jax.device_put(
            jnp.zeros(shape, dt), NamedSharding(mesh, P())
        )

    # ------------------------------------------------------------------
    def forward(
        self,
        params: Dict[str, Any],
        embed: jax.Array,  # target's embedding table [V, D]
        kv_pool: jax.Array,  # draft pool [Ld, 2, Hkv, NP, ps, Dh]
        fb: ForwardBatch,
        page_size: int,
        prev_hidden: jax.Array,  # [B, E, D] target hidden of previous pos
    ):
        """Returns (hidden [B, E, D], new_kv_pool)."""
        c = self.config
        B, E = fb.input_ids.shape
        dt = prev_hidden.dtype
        emb = embed[fb.input_ids].astype(dt)
        x = qmm(
            jnp.concatenate([emb, prev_hidden.astype(dt)], axis=-1),
            params["fc"],
            "bed,dh->beh",
        )
        eps = c.rms_norm_eps
        rope = self.rope

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            h = rms_norm(x, lp["input_norm"], eps)
            q = qmm(h, lp["wq"], "bed,dh->beh").reshape(
                B, E, c.num_attention_heads, c.head_dim
            )
            k = qmm(h, lp["wk"], "bed,dh->beh").reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            v = qmm(h, lp["wv"], "bed,dh->beh").reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            q, k = apply_rope(q, k, fb.positions, rope)
            kv_pool = write_kv(kv_pool, l, k, v, fb.out_slots)
            att = paged_attention_xla(
                q, kv_pool, l, fb.page_tables, fb.seq_lens, fb.positions,
                page_size, self.scale,
            )
            x = x + qmm(
                att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed"
            )
            h2 = rms_norm(x, lp["post_norm"], eps)
            gate = qmm(h2, lp["w_gate"], "bed,df->bef")
            up = qmm(h2, lp["w_up"], "bed,df->bef")
            x = x + qmm(jax.nn.silu(gate) * up, lp["w_down"], "bef,fd->bed")
            return (x, kv_pool, l + 1), None

        (x, kv_pool, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        return x, kv_pool


ENTRY_CLASS = EagleDraftModel
