"""Granite decoder (IBM granite-3 class).

Counterpart of the reference's `srt/models/granite.py` (behavioral spec:
HF `modeling_granite.py`): the Llama trunk with four scalar multipliers —
embedding_multiplier on the input embeddings, attention_multiplier as the
attention scale (replacing head_dim^-0.5), residual_multiplier on every
block output, and logits_scaling dividing the lm_head output.
"""

from __future__ import annotations

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.llama import LlamaForCausalLM


class GraniteForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.embedding_multiplier = hf.get("embedding_multiplier", 1.0)
        self.residual_multiplier = hf.get("residual_multiplier", 1.0)
        self.logits_scaling = hf.get("logits_scaling", 1.0)
        self.scale = hf.get("attention_multiplier", config.head_dim**-0.5)


ENTRY_CLASS = GraniteForCausalLM
