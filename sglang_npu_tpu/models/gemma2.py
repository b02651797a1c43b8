"""Gemma-2 decoder (reference `srt/models/gemma2.py`).

Differences from the Llama trunk, all handled here:
  * embeddings scaled by sqrt(hidden_size); RMSNorm uses the (1 + w) weight
    convention; GeGLU (gelu_tanh) MLP
  * sandwich norms: post-attention and post-feedforward norms around each
    residual branch
  * attention logit softcapping + final logit softcapping
  * alternating sliding-window attention (even layers windowed) — per-layer
    window selected by a traced scalar, so the XLA attention path is used
    (the Pallas kernels take a static window; per-layer kernel variants are
    a later round).
  * query scaling by query_pre_attn_scalar^-0.5
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
from sglang_npu_tpu.models.llama import LlamaForCausalLM
from sglang_npu_tpu.ops.xla_attention import paged_attention_xla, write_kv


def gemma_rms_norm(x, weight, eps):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    return (normed * (1.0 + weight.astype(jnp.float32))).astype(dtype)


class Gemma2ForCausalLM(LlamaForCausalLM):
    # alternating window/full layers pair cleanly into a hybrid full+ring
    # KV pool (ops/hybrid_kv.py); the runner flips use_hybrid_pool on
    supports_hybrid_swa = True

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        self.use_hybrid_pool = False
        hf = config.hf_config
        self.query_pre_attn_scalar = hf.get("query_pre_attn_scalar", config.head_dim)
        self.scale = self.query_pre_attn_scalar**-0.5
        self.attn_logit_softcap = hf.get("attn_logit_softcapping", 50.0) or 0.0
        self.final_logit_softcap = hf.get("final_logit_softcapping", 30.0) or 0.0
        self.sliding_window = hf.get("sliding_window", 4096)

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, D = c.num_hidden_layers, c.hidden_size
        shapes["layers"]["pre_ffw_norm"] = ((L, D), jnp.float32)
        shapes["layers"]["post_ffw_norm"] = ((L, D), jnp.float32)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["layers"]["pre_ffw_norm"] = P(None, None)
        specs["layers"]["post_ffw_norm"] = P(None, None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        per_layer["pre_feedforward_layernorm.weight"] = (
            "layers.pre_ffw_norm",
            None,
        )
        per_layer["post_feedforward_layernorm.weight"] = (
            "layers.post_ffw_norm",
            None,
        )
        return top, per_layer

    # ------------------------------------------------------------------
    def _qkv(self, params_lp, x, fb):
        c = self.config
        B, E = fb.input_ids.shape
        q = qmm(x, params_lp["wq"], "bed,dh->beh").reshape(
            B, E, c.num_attention_heads, c.head_dim
        )
        k = qmm(x, params_lp["wk"], "bed,dh->beh").reshape(
            B, E, c.num_key_value_heads, c.head_dim
        )
        v = qmm(x, params_lp["wv"], "bed,dh->beh").reshape(
            B, E, c.num_key_value_heads, c.head_dim
        )
        q, k = apply_rope(q, k, fb.positions, self.rope)
        return q, k, v

    def _mlp_residual(self, x, lp, eps):
        B, E = x.shape[:2]
        h2 = gemma_rms_norm(x, lp["pre_ffw_norm"], eps)
        gate = qmm(h2, lp["w_gate"], "bed,df->bef")
        up = qmm(h2, lp["w_up"], "bed,df->bef")
        act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(
            up.dtype
        ) * up
        mlp_out = qmm(act, lp["w_down"], "bef,fd->bed")
        return x + gemma_rms_norm(mlp_out, lp["post_ffw_norm"], eps)

    def _hybrid_backbone(self, params, kv_pool, fb: ForwardBatch, page_size: int, x):
        """Paired-layer scan over (windowed, full) layer pairs against the
        hybrid pool: windowed layers hit the bounded ring pool with a
        STATIC window (so the pallas kernels stay eligible), full layers
        the normal paged pool."""
        from sglang_npu_tpu.ops.hybrid_kv import HybridKVPool, swa_attention_xla

        c = self.config
        B, E = fb.input_ids.shape
        eps = c.rms_norm_eps
        L = c.num_hidden_layers
        pairs = jax.tree_util.tree_map(
            lambda a: a.reshape(L // 2, 2, *a.shape[1:]), params["layers"]
        )

        def attn_block(x, lp, attend):
            h = gemma_rms_norm(x, lp["input_norm"], eps)
            q, k, v = self._qkv(lp, h, fb)
            att, pool = attend(q, k, v)
            att = qmm(att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed")
            x = x + gemma_rms_norm(att, lp["post_norm"], eps)
            return self._mlp_residual(x, lp, eps), pool

        def pair_fn(carry, lp2):
            x, pf, psw, i = carry
            lp_s = jax.tree_util.tree_map(lambda a: a[0], lp2)
            lp_f = jax.tree_util.tree_map(lambda a: a[1], lp2)

            def attend_swa(q, k, v):
                return swa_attention_xla(
                    q, k, v, psw, i, fb, page_size, self.scale,
                    self.sliding_window, logit_cap=self.attn_logit_softcap,
                )

            x, psw = attn_block(x, lp_s, attend_swa)

            def attend_full(q, k, v):
                pool = write_kv(pf, i, k, v, fb.out_slots)
                out = paged_attention_xla(
                    q, pool, i, fb.page_tables, fb.seq_lens, fb.positions,
                    page_size, self.scale, logit_cap=self.attn_logit_softcap,
                )
                return out, pool

            x, pf = attn_block(x, lp_f, attend_full)
            return (x, pf, psw, i + 1), None

        (x, pf, psw, _), _ = jax.lax.scan(
            pair_fn, (x, kv_pool.full, kv_pool.swa, jnp.int32(0)), pairs
        )
        x = gemma_rms_norm(x, params["final_norm"], eps)
        return x, HybridKVPool(full=pf, swa=psw)

    def backbone_forward(self, params, kv_pool, fb: ForwardBatch, page_size: int):
        c = self.config
        B, E = fb.input_ids.shape
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        x = params["embed"][fb.input_ids].astype(dt) * jnp.asarray(
            c.hidden_size**0.5, dt
        )
        eps = c.rms_norm_eps
        rope = self.rope
        if self.use_hybrid_pool:
            return self._hybrid_backbone(params, kv_pool, fb, page_size, x)

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            h = gemma_rms_norm(x, lp["input_norm"], eps)
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
            # even layers use sliding-window attention (HF: not layer_idx % 2)
            window = jnp.where(
                jax.lax.rem(l, 2) == 0, self.sliding_window, 1 << 30
            )
            att = paged_attention_xla(
                q,
                kv_pool,
                l,
                fb.page_tables,
                fb.seq_lens,
                fb.positions,
                page_size,
                self.scale,
                logit_cap=self.attn_logit_softcap,
                sliding_window=window,
            )
            att = qmm(att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed")
            x = x + gemma_rms_norm(att, lp["post_norm"], eps)

            h2 = gemma_rms_norm(x, lp["pre_ffw_norm"], eps)
            gate = qmm(h2, lp["w_gate"], "bed,df->bef")
            up = qmm(h2, lp["w_up"], "bed,df->bef")
            act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(
                up.dtype
            ) * up
            mlp_out = qmm(act, lp["w_down"], "bef,fd->bed")
            x = x + gemma_rms_norm(mlp_out, lp["post_ffw_norm"], eps)
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        x = gemma_rms_norm(x, params["final_norm"], eps)
        return x, new_kv

    def __call__(self, params, kv_pool, fb: ForwardBatch, page_size: int):
        last, new_kv = self.hidden_forward(params, kv_pool, fb, page_size)
        logits = jnp.einsum(
            "bd,vd->bv", last, params["embed"], preferred_element_type=jnp.float32
        )
        if self.final_logit_softcap > 0:
            logits = self.final_logit_softcap * jnp.tanh(
                logits / self.final_logit_softcap
            )
        return logits, new_kv
