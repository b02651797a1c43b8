"""MiniCPM decoder (muP-scaled Llama trunk).

Counterpart of the reference's `srt/models/minicpm.py:1`: standard Llama
naming with three muP scalars — embeddings x `scale_emb`, every block
output x `scale_depth / sqrt(num_layers)`, and logits computed from
`hidden / (hidden_size / dim_model_base)` (reference `minicpm.py:220,273,
314,330`).  All three map onto the trunk's existing granite-class
multipliers."""

from __future__ import annotations

import math

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.llama import LlamaForCausalLM


class MiniCPMForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.embedding_multiplier = float(hf.get("scale_emb", 1.0))
        self.residual_multiplier = float(
            hf.get("scale_depth", 1.0)
        ) / math.sqrt(config.num_hidden_layers)
        self.logits_scaling = float(
            config.hidden_size / hf.get("dim_model_base", config.hidden_size)
        )


ENTRY_CLASS = MiniCPMForCausalLM
