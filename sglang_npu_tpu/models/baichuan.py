"""Baichuan / Baichuan2 decoder (7B rope, 13B ALiBi).

Counterpart of the reference's `srt/models/baichuan.py:1`: the Llama trunk
with a fused `W_pack` qkv projection (MHA, no biases), rope for the
hidden-4096 (7B) variants and ALiBi for 13B (`position_embedding ==
"ALIBI"`), and Baichuan2's load-time L2 normalization of the lm_head rows
(reference `baichuan.py:396` — v2 detected by its 125,696-token vocab).

TPU notes: ALiBi rides the XLA attention path as a per-head bias on the
scores (`ops/xla_attention.py alibi_slopes`); rope is disabled for ALiBi
models by zeroing the rope tables (identity rotation) so the trunk scan
stays shared with llama."""

from __future__ import annotations

import math
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM
from sglang_npu_tpu.ops.xla_attention import paged_attention_xla, write_kv


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Standard ALiBi slope schedule (reference `_get_alibi_slopes`)."""
    closest = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = [base ** i for i in range(1, closest + 1)]
    if closest != n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        n_rem = min(closest, n_heads - closest)
        slopes += [extra_base ** i for i in range(1, 2 * n_rem, 2)]
    return np.asarray(slopes, np.float32)


class BaichuanForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        # reference BaichuanForCausalLM: 4096-hidden models (7B) are rope,
        # everything else (13B) ALiBi; an explicit position_embedding in
        # the config wins either way
        pe = hf.get("position_embedding")
        if pe is not None:
            self.use_alibi = pe == "ALIBI"
        else:
            self.use_alibi = config.hidden_size != 4096
        if self.use_alibi:
            self.alibi = jnp.asarray(
                alibi_slopes(config.num_attention_heads)
            )
            # identity rope: ALiBi models carry no rotary embedding
            self.rope = {
                "cos": jnp.ones_like(self.rope["cos"]),
                "sin": jnp.zeros_like(self.rope["sin"]),
            }
            # ALiBi needs the score-bias hook: only the XLA backend has it
            self.attn_backend = None

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        for k in (
            "self_attn.q_proj.weight",
            "self_attn.k_proj.weight",
            "self_attn.v_proj.weight",
        ):
            per_layer.pop(k, None)
        H = self.config.hidden_size

        def cut(i):
            return lambda t: t[i * H : (i + 1) * H].T

        per_layer["self_attn.W_pack.weight"] = (
            (
                ("layers.wq", cut(0)),
                ("layers.wk", cut(1)),
                ("layers.wv", cut(2)),
            ),
            None,
        )
        if self.config.vocab_size == 125696:
            # Baichuan2 normalizes the head weights at load
            def norm_head(t):
                t = t.astype(np.float32)
                return (
                    t / np.linalg.norm(t, axis=1, keepdims=True).clip(1e-12)
                ).T

            top["lm_head.weight"] = ("lm_head", norm_head)
        return top, per_layer

    def _attention(self, q, k, v, kv_pool, layer_idx, fb: ForwardBatch, page_size: int):
        if not self.use_alibi:
            return super()._attention(
                q, k, v, kv_pool, layer_idx, fb, page_size
            )
        kv_pool = write_kv(kv_pool, layer_idx, k, v, fb.out_slots)
        out = paged_attention_xla(
            q, kv_pool, layer_idx, fb.page_tables, fb.seq_lens,
            fb.positions, page_size, self.scale, alibi_slopes=self.alibi,
        )
        return out, kv_pool


ENTRY_CLASS = BaichuanForCausalLM
