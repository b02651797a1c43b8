"""Gemma-3 text decoder (reference `srt/models/gemma3_causal.py`).

Differences from Gemma-2 (all per the reference/HF behavior):
  * 5:1 sliding:full layer pattern (HF ``layer_types`` /
    ``sliding_window_pattern``) instead of alternating — handled here
    with a uniform layer scan and `lax.cond` on a per-layer flag, so any
    pattern works and both branches compile once (TPU-friendly: no
    per-layer unrolling, static window inside each branch).
  * per-layer RoPE: windowed layers use ``rope_local_base_freq`` with no
    scaling; full layers use ``rope_theta`` (+ ``rope_scaling``).
  * gemma-style RMS q/k-norm over head_dim (reference
    `gemma3_causal.py:200`), applied before RoPE.
  * no attention/final logit softcapping.

With a hybrid full+ring pool (`ops/hybrid_kv.py`), windowed layers hit
the bounded ring pool; the `lax.cond` branches update their respective
pool and per-pool layer counters travel in the scan carry.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import apply_rope, make_rope_tables
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.gemma2 import Gemma2ForCausalLM, gemma_rms_norm
from sglang_npu_tpu.ops.xla_attention import paged_attention_xla, write_kv


class Gemma3ForCausalLM(Gemma2ForCausalLM):
    supports_hybrid_swa = True

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.attn_logit_softcap = 0.0
        self.final_logit_softcap = 0.0
        maxp = max(config.context_length, config.max_position_embeddings)
        self.rope_local = make_rope_tables(
            config.head_dim,
            maxp,
            hf.get("rope_local_base_freq", 10000.0),
            None,
        )
        self.rope_global = make_rope_tables(
            config.head_dim, maxp, config.rope_theta, config.rope_scaling
        )
        self.swa_flags = config.swa_layers or [False] * config.num_hidden_layers

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L = c.num_hidden_layers
        shapes["layers"]["q_norm"] = ((L, c.head_dim), jnp.float32)
        shapes["layers"]["k_norm"] = ((L, c.head_dim), jnp.float32)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["layers"]["q_norm"] = P(None, None)
        specs["layers"]["k_norm"] = P(None, None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        per_layer["self_attn.q_norm.weight"] = ("layers.q_norm", None)
        per_layer["self_attn.k_norm.weight"] = ("layers.k_norm", None)
        return top, per_layer

    # ------------------------------------------------------------------
    def backbone_forward(self, params, kv_pool, fb: ForwardBatch, page_size: int):
        from sglang_npu_tpu.ops.hybrid_kv import HybridKVPool, swa_attention_xla

        c = self.config
        B, E = fb.input_ids.shape
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        x = params["embed"][fb.input_ids].astype(dt) * jnp.asarray(
            c.hidden_size**0.5, dt
        )
        if fb.input_embeds is not None:
            # multimodal: image rows replaced by (unscaled) vision embeds
            x = jnp.where(
                fb.embed_mask[..., None], fb.input_embeds.astype(dt), x
            )
        eps = c.rms_norm_eps
        flags = jnp.asarray(self.swa_flags)
        hybrid = self.use_hybrid_pool

        def qkv(lp, h):
            q = qmm(h, lp["wq"], "bed,dh->beh").reshape(
                B, E, c.num_attention_heads, c.head_dim
            )
            k = qmm(h, lp["wk"], "bed,dh->beh").reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            v = qmm(h, lp["wv"], "bed,dh->beh").reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            q = gemma_rms_norm(q, lp["q_norm"], eps)
            k = gemma_rms_norm(k, lp["k_norm"], eps)
            return q, k, v

        def layer_fn(carry, xs):
            lp, flag = xs
            if hybrid:
                x, pf, psw, i_full, i_swa = carry
            else:
                x, pool, i = carry
            h = gemma_rms_norm(x, lp["input_norm"], eps)
            q0, k0, v = qkv(lp, h)

            if hybrid:

                def swa_branch(q0, k0, v, pf, psw, i_full, i_swa):
                    q, k = apply_rope(q0, k0, fb.positions, self.rope_local)
                    out, psw = swa_attention_xla(
                        q, k, v, psw, i_swa, fb, page_size, self.scale,
                        c.sliding_window,
                    )
                    return out, pf, psw

                def full_branch(q0, k0, v, pf, psw, i_full, i_swa):
                    q, k = apply_rope(q0, k0, fb.positions, self.rope_global)
                    pf = write_kv(pf, i_full, k, v, fb.out_slots)
                    out = paged_attention_xla(
                        q, pf, i_full, fb.page_tables, fb.seq_lens,
                        fb.positions, page_size, self.scale,
                    )
                    return out, pf, psw

                att, pf, psw = jax.lax.cond(
                    flag, swa_branch, full_branch,
                    q0, k0, v, pf, psw, i_full, i_swa,
                )
            else:

                def swa_branch(q0, k0, v, pool, i):
                    q, k = apply_rope(q0, k0, fb.positions, self.rope_local)
                    pool = write_kv(pool, i, k, v, fb.out_slots)
                    out = paged_attention_xla(
                        q, pool, i, fb.page_tables, fb.seq_lens, fb.positions,
                        page_size, self.scale,
                        sliding_window=c.sliding_window,
                        mm_groups=fb.mm_groups,
                    )
                    return out, pool

                def full_branch(q0, k0, v, pool, i):
                    q, k = apply_rope(q0, k0, fb.positions, self.rope_global)
                    pool = write_kv(pool, i, k, v, fb.out_slots)
                    out = paged_attention_xla(
                        q, pool, i, fb.page_tables, fb.seq_lens, fb.positions,
                        page_size, self.scale,
                        mm_groups=fb.mm_groups,
                    )
                    return out, pool

                att, pool = jax.lax.cond(
                    flag, swa_branch, full_branch, q0, k0, v, pool, i
                )

            att = qmm(att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed")
            x = x + gemma_rms_norm(att, lp["post_norm"], eps)
            x = self._mlp_residual(x, lp, eps)
            if hybrid:
                i_full = i_full + jnp.where(flag, 0, 1)
                i_swa = i_swa + jnp.where(flag, 1, 0)
                return (x, pf, psw, i_full, i_swa), None
            return (x, pool, i + 1), None

        if hybrid:
            (x, pf, psw, _, _), _ = jax.lax.scan(
                layer_fn,
                (x, kv_pool.full, kv_pool.swa, jnp.int32(0), jnp.int32(0)),
                (params["layers"], flags),
            )
            new_pool = HybridKVPool(full=pf, swa=psw)
        else:
            (x, new_pool, _), _ = jax.lax.scan(
                layer_fn, (x, kv_pool, jnp.int32(0)), (params["layers"], flags)
            )
        x = gemma_rms_norm(x, params["final_norm"], eps)
        return x, new_pool
