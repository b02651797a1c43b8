"""Qwen (v1) decoder.

Counterpart of the reference's `srt/models/qwen.py:1`: Llama-class trunk
with QWen-v1 checkpoint naming (`transformer.h.N.attn.c_attn` fused qkv
WITH bias, `attn.c_proj`, `mlp.w2` = gate / `mlp.w1` = up / `mlp.c_proj` =
down at `intermediate_size // 2` width, RMSNorm `ln_1`/`ln_2`,
`transformer.wte`, `transformer.ln_f`, `lm_head`)."""

from __future__ import annotations

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.llama import LlamaForCausalLM


class QWenLMHeadModel(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        # QWen-v1 configs report the SUM of the two ffn halves
        # (reference `qwen.py:183` uses intermediate_size // 2); guard so
        # re-instantiation over the same ModelConfig doesn't halve twice
        if not getattr(config, "_qwen_v1_halved", False):
            config.intermediate_size //= 2
            config._qwen_v1_halved = True
        config.attention_bias = True  # c_attn carries bias
        super().__init__(config, attn_backend)

    def hf_weight_map(self):
        top = {
            "transformer.wte.weight": ("embed", None),
            "transformer.ln_f.weight": ("final_norm", None),
        }
        if not self.config.tie_word_embeddings:
            top["lm_head.weight"] = ("lm_head", "transpose")
        return top, {}

    def hf_block_maps(self):
        c = self.config
        H = self.q_size

        def cut_w(i):
            return lambda t: t[i * H : (i + 1) * H].T

        def cut_b(i):
            return lambda t: t[i * H : (i + 1) * H]

        return {
            "transformer.h.": {
                "ln_1.weight": ("layers.input_norm", None),
                "ln_2.weight": ("layers.post_norm", None),
                "attn.c_attn.weight": (
                    (
                        ("layers.wq", cut_w(0)),
                        ("layers.wk", cut_w(1)),
                        ("layers.wv", cut_w(2)),
                    ),
                    None,
                ),
                "attn.c_attn.bias": (
                    (
                        ("layers.bq", cut_b(0)),
                        ("layers.bk", cut_b(1)),
                        ("layers.bv", cut_b(2)),
                    ),
                    None,
                ),
                "attn.c_proj.weight": ("layers.wo", "transpose"),
                "mlp.w2.weight": ("layers.w_gate", "transpose"),
                "mlp.w1.weight": ("layers.w_up", "transpose"),
                "mlp.c_proj.weight": ("layers.w_down", "transpose"),
            }
        }

ENTRY_CLASS = QWenLMHeadModel
