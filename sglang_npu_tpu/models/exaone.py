"""EXAONE v1/v2/v3 decoder (LG AI).

Counterpart of the reference's `srt/models/exaone.py:1`: the Llama trunk
under EXAONE checkpoint naming (`transformer.h.N.ln_1/ln_2` RMSNorms,
`attn.attention.{q,k,v,out}_proj`, `mlp.c_fc_0` = gate / `c_fc_1` = up /
`c_proj` = down, `transformer.wte`, `transformer.ln_f`), eps from
`layer_norm_epsilon`, optional `partial_rotary_factor` rope (reference
`exaone.py:118`)."""

from __future__ import annotations

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.llama import LlamaForCausalLM
from sglang_npu_tpu.models.phi import rope_partial


class ExaoneForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        self.rot_dims = int(
            config.head_dim
            * config.hf_config.get("partial_rotary_factor", 1.0)
        )
        if self.rot_dims != config.head_dim:
            from sglang_npu_tpu.layers.ops import make_rope_tables

            self.rope = make_rope_tables(
                self.rot_dims,
                max(config.context_length, config.max_position_embeddings),
                config.rope_theta,
                config.rope_scaling,
            )

    def rope_apply(self, q, k, rope_cs):
        if self.rot_dims == self.config.head_dim:
            return super().rope_apply(q, k, rope_cs)
        return rope_partial(q, k, *rope_cs, self.rot_dims)

    def hf_weight_map(self):
        top = {
            "transformer.wte.weight": ("embed", None),
            "transformer.ln_f.weight": ("final_norm", None),
        }
        if not self.config.tie_word_embeddings:
            top["lm_head.weight"] = ("lm_head", "transpose")
        return top, {}

    def hf_block_maps(self):
        return {
            "transformer.h.": {
                "ln_1.weight": ("layers.input_norm", None),
                "ln_2.weight": ("layers.post_norm", None),
                "attn.attention.q_proj.weight": ("layers.wq", "transpose"),
                "attn.attention.k_proj.weight": ("layers.wk", "transpose"),
                "attn.attention.v_proj.weight": ("layers.wv", "transpose"),
                "attn.attention.out_proj.weight": ("layers.wo", "transpose"),
                "mlp.c_fc_0.weight": ("layers.w_gate", "transpose"),
                "mlp.c_fc_1.weight": ("layers.w_up", "transpose"),
                "mlp.c_proj.weight": ("layers.w_down", "transpose"),
            }
        }

ENTRY_CLASS = ExaoneForCausalLM
