"""Xiaomi MiMo decoder + its MTP (multi-token prediction) draft head.

Counterparts of the reference's `srt/models/mimo.py:1` (a pure Qwen2
trunk) and `srt/models/mimo_mtp.py:1` (one extra Qwen2 decoder block fed
by `input_proj(cat(hidden_layernorm(prev_hidden),
token_layernorm(embed)))`, closed by `final_layernorm`; HF names
`model.mtp_layers.0.*`).  The MTP head plugs into the EAGLE runner as a
NEXTN-class draft: same `forward(params, embed, pool, fb, ps, prev_h)`
interface as DeepseekNextNModel, over a standard 1-layer paged KV pool."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import rms_norm
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM


class MiMoForCausalLM(LlamaForCausalLM):
    """Qwen2 trunk under the MiMo name (qkv bias)."""

    def __init__(self, config: ModelConfig, attn_backend=None):
        config.attention_bias = True
        super().__init__(config, attn_backend)


class MiMoMTPModel(LlamaForCausalLM):
    """MTP draft: token/hidden norms + input_proj + one Qwen2 block +
    final_layernorm.  embed/lm_head are shared with the target."""

    def __init__(self, config: ModelConfig, attn_backend=None):
        config.attention_bias = True
        super().__init__(config, attn_backend)

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        D = c.hidden_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        full = super().param_shapes()
        blk = {
            k: ((1,) + tuple(shape[1:]), d)
            for k, (shape, d) in full["layers"].items()
        }
        return {
            "token_norm": ((D,), jnp.float32),
            "hidden_norm": ((D,), jnp.float32),
            "input_proj": ((2 * D, D), dt),
            "final_norm": ((D,), jnp.float32),
            "layers": blk,
        }

    def param_shardings(self) -> Dict[str, Any]:
        full = super().param_shardings()
        return {
            "token_norm": P(None),
            "hidden_norm": P(None),
            "input_proj": P(None, None),
            "final_norm": P(None),
            "layers": full["layers"],
        }

    def hf_weight_map(self):
        _, per_layer = super().hf_weight_map()
        pre = "model.mtp_layers.0."
        m: Dict[str, tuple] = {
            pre + "token_layernorm.weight": ("token_norm", None),
            pre + "hidden_layernorm.weight": ("hidden_norm", None),
            pre + "input_proj.weight": ("input_proj", "transpose"),
            pre + "final_layernorm.weight": ("final_norm", None),
        }
        for suffix, (dest, tf) in per_layer.items():
            m[pre + suffix] = (dest, tf)
        return m, {}

    def make_draft_pool(self, num_pages: int, page_size: int, mesh):
        c = self.config
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        rep = NamedSharding(mesh, P())
        return jax.device_put(
            jnp.zeros(
                (1, 2, c.num_key_value_heads, num_pages, page_size, c.head_dim),
                dt,
            ),
            rep,
        )

    def forward(
        self,
        params: Dict[str, Any],
        embed: jax.Array,  # target's embedding table [V, D]
        kv_pool: jax.Array,  # 1-layer draft pool
        fb: ForwardBatch,
        page_size: int,
        prev_hidden: jax.Array,  # [B, E, D]
    ):
        c = self.config
        B, E = fb.input_ids.shape
        dt = prev_hidden.dtype
        eps = c.rms_norm_eps

        emb = embed[fb.input_ids].astype(dt)
        x = jnp.einsum(
            "bed,dh->beh",
            jnp.concatenate(
                [
                    rms_norm(prev_hidden.astype(dt), params["hidden_norm"], eps),
                    rms_norm(emb, params["token_norm"], eps),
                ],
                axis=-1,
            ),
            params["input_proj"],
        )

        lp = {k: v[0] for k, v in params["layers"].items()}
        rope_cs = self._rope_cos_sin(fb)
        h = rms_norm(x, lp["input_norm"], eps)
        q = qmm(h, lp["wq"], "bed,dh->beh") + lp["bq"]
        k = qmm(h, lp["wk"], "bed,dh->beh") + lp["bk"]
        v = qmm(h, lp["wv"], "bed,dh->beh") + lp["bv"]
        q = q.reshape(B, E, c.num_attention_heads, c.head_dim)
        k = k.reshape(B, E, c.num_key_value_heads, c.head_dim)
        v = v.reshape(B, E, c.num_key_value_heads, c.head_dim)
        q, k = self.rope_apply(q, k, rope_cs)
        att, kv_pool = self._attention(
            q, k, v, kv_pool, jnp.int32(0), fb, page_size
        )
        x = x + qmm(att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed")
        h2 = rms_norm(x, lp["post_norm"], eps)
        g = qmm(h2, lp["w_gate"], "bed,df->bef")
        u = qmm(h2, lp["w_up"], "bed,df->bef")
        x = x + qmm(jax.nn.silu(g) * u, lp["w_down"], "bef,fd->bed")
        return rms_norm(x, params["final_norm"], eps), kv_pool


ENTRY_CLASS = MiMoForCausalLM
