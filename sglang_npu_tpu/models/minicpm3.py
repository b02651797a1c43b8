"""MiniCPM3 decoder (MLA-lite + muP scalings).

Counterpart of the reference's `srt/models/minicpm3.py:1`: DeepSeek-V2
style multi-head latent attention (q_lora + kv_lora, nope/rope split) at
small ranks, with MiniCPM's muP scalars — embeddings x `scale_emb`, block
outputs x `scale_depth / sqrt(L)`, logits from
`hidden / (hidden_size / dim_model_base)` (reference `minicpm3.py` +
`minicpm.py:220,273,314`).  Checkpoint naming matches deepseek-v2
(`self_attn.q_a_proj`/`kv_a_proj_with_mqa`/... under `model.layers.N.`)."""

from __future__ import annotations

import math

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM


class MiniCPM3ForCausalLM(DeepseekV2ForCausalLM):
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


ENTRY_CLASS = MiniCPM3ForCausalLM
