"""ChatGLM2/3 / GLM-4-9B-class decoder (THUDM).

Counterpart of the reference's `srt/models/chatglm.py:1` (behavioral spec:
THUDM `modeling_chatglm.py`): Llama-class prenorm trunk with

  * fused `query_key_value` projection (MQA via `multi_query_group_num`)
    with qkv bias (`add_qkv_bias`);
  * INTERLEAVED (GPT-J style, `is_neox_style=False`) rotary over HALF the
    head dim, base `10000 * rope_ratio` (reference `chatglm.py:103-108`);
  * SwiGLU MLP stored as ONE fused `dense_h_to_4h` [2F, H] tensor
    (silu(first half) * second half), `dense_4h_to_h` down;
  * RMSNorm (`config.rmsnorm`), eps `layernorm_epsilon`.

Config field names (num_layers / ffn_hidden_size / seq_length /
padded_vocab_size / multi_query_group_num) normalize in
`configs/model_config.py`."""

from __future__ import annotations

import jax.numpy as jnp

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import make_rope_tables
from sglang_npu_tpu.models.llama import LlamaForCausalLM


def apply_rope_interleaved_partial(q, k, cos, sin, rot_dims: int):
    """GPT-J-style rope on the first ``rot_dims`` of the head dim: pairs
    (2i, 2i+1) rotate by angle(pos, i); the rest passes through."""

    def rot(x):
        xr, xp = x[..., :rot_dims], x[..., rot_dims:]
        x1 = xr[..., 0::2]
        x2 = xr[..., 1::2]
        # cos/sin: [B, T, rot_dims//2]
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
        return jnp.concatenate([out, xp], axis=-1)

    return rot(q), rot(k)


class ChatGLMForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        hf = config.hf_config
        if not getattr(config, "_glm_normalized", False):
            config.attention_bias = bool(
                hf.get("add_qkv_bias", False) or hf.get("add_bias_linear", False)
            )
            config._glm_normalized = True
        assert hf.get("rmsnorm", True), "LayerNorm ChatGLM-v1 not supported"
        super().__init__(config, attn_backend)
        self.rot_dims = config.head_dim // 2
        self.rope = make_rope_tables(
            self.rot_dims,
            max(config.context_length, config.max_position_embeddings),
            10000.0 * hf.get("rope_ratio", 1.0),
            None,
        )

    def rope_apply(self, q, k, rope_cs):
        return apply_rope_interleaved_partial(q, k, *rope_cs, self.rot_dims)

    def hf_weight_map(self):
        top = {
            "transformer.embedding.word_embeddings.weight": ("embed", None),
            "transformer.encoder.final_layernorm.weight": ("final_norm", None),
            "transformer.output_layer.weight": ("lm_head", "transpose"),
        }
        return top, {}

    def hf_block_maps(self):
        qs, ks = self.q_size, self.kv_size

        def cut_w(lo, hi):
            return lambda t: t[lo:hi].T

        def cut_b(lo, hi):
            return lambda t: t[lo:hi]

        blk = {
            "input_layernorm.weight": ("layers.input_norm", None),
            "post_attention_layernorm.weight": ("layers.post_norm", None),
            "self_attention.query_key_value.weight": (
                (
                    ("layers.wq", cut_w(0, qs)),
                    ("layers.wk", cut_w(qs, qs + ks)),
                    ("layers.wv", cut_w(qs + ks, qs + 2 * ks)),
                ),
                None,
            ),
            "self_attention.dense.weight": ("layers.wo", "transpose"),
            "mlp.dense_h_to_4h.weight": (
                (
                    ("layers.w_gate", lambda t: t[: t.shape[0] // 2].T),
                    ("layers.w_up", lambda t: t[t.shape[0] // 2 :].T),
                ),
                None,
            ),
            "mlp.dense_4h_to_h.weight": ("layers.w_down", "transpose"),
        }
        if self.config.attention_bias:
            blk["self_attention.query_key_value.bias"] = (
                (
                    ("layers.bq", cut_b(0, qs)),
                    ("layers.bk", cut_b(qs, qs + ks)),
                    ("layers.bv", cut_b(qs + ks, qs + 2 * ks)),
                ),
                None,
            )
        return {"transformer.encoder.layers.": blk}


ENTRY_CLASS = ChatGLMForCausalLM
