"""Gemma (v1) decoder (reference `srt/models/gemma.py`).

A llama-shaped pre-norm trunk with three Gemma-isms, all expressed as
hooks on the shared trunk rather than a copied backbone:
  * embeddings scaled by sqrt(hidden_size)  -> embedding_multiplier
  * RMSNorm uses the (1 + w) weight convention -> norm_fn hook
  * GeGLU MLP with tanh-approximate gelu    -> _mlp override
Word embeddings are always tied; no attention bias, no q/k norms, plain
rope (theta from config).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.models.gemma2 import gemma_rms_norm
from sglang_npu_tpu.models.llama import LlamaForCausalLM


class GemmaForCausalLM(LlamaForCausalLM):
    norm_fn = staticmethod(gemma_rms_norm)

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        self.embedding_multiplier = float(config.hidden_size ** 0.5)

    def _mlp(self, h, lp, proj=None, collect_stats=False, stats_mask=None):
        assert not collect_stats
        if proj is None:
            proj = lambda x, lp_, k, eq: qmm(x, lp_[k], eq)
        gate = proj(h, lp, "w_gate", "bed,df->bef")
        up = proj(h, lp, "w_up", "bed,df->bef")
        act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(
            up.dtype
        ) * up
        return proj(act, lp, "w_down", "bef,fd->bed")


ENTRY_CLASS = GemmaForCausalLM
