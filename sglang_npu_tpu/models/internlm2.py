"""InternLM2 decoder (+ reward model head).

Counterpart of the reference's `srt/models/internlm2.py:1` and
`internlm2_reward.py:1`: the Llama trunk with InternLM2 checkpoint naming
(`model.layers.N.attention.wqkv/wo`, `feed_forward.w1/w3/w2`,
`attention_norm`/`ffn_norm`, `model.tok_embeddings`, head `output`) and
the INTERLEAVED fused wqkv layout — the checkpoint stores
[kv_heads, (groups + 2), head_dim, hidden] so q/k/v de-interleave at load
(reference `internlm2.py:335-349`)."""

from __future__ import annotations

import jax.numpy as jnp

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.llama import LlamaForCausalLM


class InternLM2ForCausalLM(LlamaForCausalLM):
    def hf_weight_map(self):
        c = self.config
        top = {
            "model.tok_embeddings.weight": ("embed", None),
            "model.norm.weight": ("final_norm", None),
        }
        if not c.tie_word_embeddings:
            top["output.weight"] = ("lm_head", "transpose")
        g = c.num_attention_heads // c.num_key_value_heads
        d = c.head_dim

        def part(which):
            def cut(t):
                # [kv*(g+2)*d, hidden] -> view [kv, g+2, d, hidden]
                w = t.reshape(c.num_key_value_heads, g + 2, d, t.shape[-1])
                if which == "q":
                    w = w[:, :g]
                elif which == "k":
                    w = w[:, g : g + 1]
                else:
                    w = w[:, g + 1 :]
                return w.reshape(-1, t.shape[-1]).T

            return cut

        per_layer = {
            "attention_norm.weight": ("layers.input_norm", None),
            "ffn_norm.weight": ("layers.post_norm", None),
            "attention.wqkv.weight": (
                (
                    ("layers.wq", part("q")),
                    ("layers.wk", part("k")),
                    ("layers.wv", part("v")),
                ),
                None,
            ),
            "attention.wo.weight": ("layers.wo", "transpose"),
            "feed_forward.w1.weight": ("layers.w_gate", "transpose"),
            "feed_forward.w3.weight": ("layers.w_up", "transpose"),
            "feed_forward.w2.weight": ("layers.w_down", "transpose"),
        }
        return top, per_layer


class InternLM2ForRewardModel(InternLM2ForCausalLM):
    """Reference `srt/models/internlm2_reward.py:1`: the trunk + a scalar
    `v_head` on the last token (served as an embedding/reward model)."""

    is_embedding = True

    def param_shapes(self):
        shapes = super().param_shapes()
        shapes.pop("lm_head", None)
        dt = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        shapes["v_head"] = ((self.config.hidden_size, 1), dt)
        return shapes

    def param_shardings(self):
        from jax.sharding import PartitionSpec as P

        specs = super().param_shardings()
        specs.pop("lm_head", None)
        specs["v_head"] = P(None, None)
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        top.pop("output.weight", None)
        top["v_head.weight"] = ("v_head", "transpose")
        return top, per_layer

    def embed_forward(self, params, kv_pool, fb, page_size):
        last, kv_pool = self.hidden_forward(params, kv_pool, fb, page_size)
        reward = last.astype(jnp.float32) @ params["v_head"].astype(
            jnp.float32
        )
        return reward, kv_pool


ENTRY_CLASS = InternLM2ForCausalLM
