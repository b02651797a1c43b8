"""GPT-2 and GPTBigCode (Starcoder-1) decoders.

Counterparts of the reference's `srt/models/gpt2.py` and
`srt/models/gpt_bigcode.py` (behavioral specs: HF `modeling_gpt2.py`,
`modeling_gpt_bigcode.py`): learned absolute position embeddings
(wte + wpe, no rope), pre-LayerNorm blocks with biases everywhere, one
fused c_attn projection, GELU(tanh) two-matmul MLP, tied lm_head.

GPT-2 stores c_attn as a Conv1D ([in, out] — already our orientation);
GPTBigCode uses nn.Linear ([out, in] — transposed) and is MQA
(``multi_query``: one shared KV head).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM
from sglang_npu_tpu.models.starcoder2 import layer_norm


class GPT2LMHeadModel(LlamaForCausalLM):
    qkv_transpose = None  # Conv1D stores [in, out]

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        self.ln_eps = config.hf_config.get("layer_norm_epsilon", 1e-5)
        self.kv_size = config.num_key_value_heads * config.head_dim

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, D, F = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        fused = self.q_size + 2 * self.kv_size
        return {
            "embed": ((c.vocab_size, D), dt),
            "pos_embed": ((c.max_position_embeddings, D), dt),
            "final_norm": ((D,), jnp.float32),
            "final_norm_b": ((D,), jnp.float32),
            "layers": {
                "ln1": ((L, D), jnp.float32),
                "ln1_b": ((L, D), jnp.float32),
                "ln2": ((L, D), jnp.float32),
                "ln2_b": ((L, D), jnp.float32),
                "w_qkv": ((L, D, fused), dt),
                "b_qkv": ((L, fused), dt),
                "wo": ((L, self.q_size, D), dt),
                "bo": ((L, D), dt),
                "c_fc": ((L, D, F), dt),
                "b_fc": ((L, F), dt),
                "c_proj": ((L, F, D), dt),
                "b_proj": ((L, D), dt),
            },
        }

    def param_shardings(self) -> Dict[str, Any]:
        return {
            "embed": P(None, "model"),
            "pos_embed": P(None, None),
            "final_norm": P(None),
            "final_norm_b": P(None),
            "layers": {
                "ln1": P(None, None),
                "ln1_b": P(None, None),
                "ln2": P(None, None),
                "ln2_b": P(None, None),
                # fused q|k|v: keep unsharded (column split would cross
                # the fusion boundary)
                "w_qkv": P(None, None, None),
                "b_qkv": P(None, None),
                "wo": P(None, "model", None),
                "bo": P(None, None),
                "c_fc": P(None, None, "model"),
                "b_fc": P(None, "model"),
                "c_proj": P(None, "model", None),
                "b_proj": P(None, None),
            },
        }

    def hf_weight_map(self):
        return {
            "transformer.wte.weight": ("embed", None),
            "transformer.wpe.weight": ("pos_embed", None),
            "transformer.ln_f.weight": ("final_norm", None),
            "transformer.ln_f.bias": ("final_norm_b", None),
            # bare names (some exports drop the "transformer." prefix)
            "wte.weight": ("embed", None),
            "wpe.weight": ("pos_embed", None),
            "ln_f.weight": ("final_norm", None),
            "ln_f.bias": ("final_norm_b", None),
        }, {}

    def hf_block_maps(self):
        tr = self.qkv_transpose
        bm = {
            "ln_1.weight": ("layers.ln1", None),
            "ln_1.bias": ("layers.ln1_b", None),
            "ln_2.weight": ("layers.ln2", None),
            "ln_2.bias": ("layers.ln2_b", None),
            "attn.c_attn.weight": ("layers.w_qkv", tr),
            "attn.c_attn.bias": ("layers.b_qkv", None),
            "attn.c_proj.weight": ("layers.wo", tr),
            "attn.c_proj.bias": ("layers.bo", None),
            "mlp.c_fc.weight": ("layers.c_fc", tr),
            "mlp.c_fc.bias": ("layers.b_fc", None),
            "mlp.c_proj.weight": ("layers.c_proj", tr),
            "mlp.c_proj.bias": ("layers.b_proj", None),
        }
        return {"transformer.h.": bm, "h.": bm}

    # ------------------------------------------------------------------
    def backbone_forward(
        self, params, kv_pool, fb: ForwardBatch, page_size: int,
        collect_moe: bool = False, moe_mask=None,
    ):
        assert not collect_moe
        c = self.config
        B, E = fb.input_ids.shape
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        x = (
            params["embed"][fb.input_ids]
            + params["pos_embed"][fb.positions]
        ).astype(dt)
        eps = self.ln_eps
        qs, ks = self.q_size, self.kv_size

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            h = layer_norm(x, lp["ln1"], lp["ln1_b"], eps)
            qkv = qmm(h, lp["w_qkv"], "bed,dh->beh") + lp["b_qkv"]
            q = qkv[..., :qs].reshape(B, E, c.num_attention_heads, c.head_dim)
            k = qkv[..., qs:qs + ks].reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            v = qkv[..., qs + ks:].reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            x = x + (
                qmm(att.reshape(B, E, qs), lp["wo"], "beh,hd->bed")
                + lp["bo"]
            )
            h2 = layer_norm(x, lp["ln2"], lp["ln2_b"], eps)
            h2 = qmm(h2, lp["c_fc"], "bed,df->bef") + lp["b_fc"]
            h2 = jax.nn.gelu(h2.astype(jnp.float32), approximate=True).astype(
                x.dtype
            )
            x = x + (qmm(h2, lp["c_proj"], "bef,fd->bed") + lp["b_proj"])
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), params["layers"]
        )
        x = layer_norm(x, params["final_norm"], params["final_norm_b"], eps)
        return x, new_kv


class GPTBigCodeForCausalLM(GPT2LMHeadModel):
    qkv_transpose = "transpose"  # nn.Linear stores [out, in]


ENTRY_CLASS = GPT2LMHeadModel
