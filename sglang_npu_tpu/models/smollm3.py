"""SmolLM3 decoder.

Counterpart of the reference's `srt/models/smollm3.py` (behavioral spec:
HF `modeling_smollm3.py`): plain Llama weights, but NoPE layers — every
``no_rope_layer_interval``-th layer skips rotary embedding entirely
(``no_rope_layers[l] == 0``).  Expressed as a traced per-layer flag that
lerps between rotated and raw q/k inside the stacked-layer scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import apply_rope_cs, rms_norm
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM


class SmolLM3ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        rope_flags = hf.get("no_rope_layers")  # 1 = rope ON (HF naming...)
        if rope_flags is None:
            interval = hf.get("no_rope_layer_interval", 4)
            rope_flags = [
                0 if (i + 1) % interval == 0 else 1
                for i in range(config.num_hidden_layers)
            ]
        self.rope_on = jnp.asarray(rope_flags, jnp.float32)

    def backbone_forward(
        self, params, kv_pool, fb: ForwardBatch, page_size: int,
        collect_moe: bool = False, moe_mask=None,
    ):
        assert not collect_moe
        c = self.config
        B, E = fb.input_ids.shape
        x = params["embed"][fb.input_ids].astype(
            jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        )
        eps = c.rms_norm_eps
        rope_cs = self._rope_cos_sin(fb)

        def layer_fn(carry, xs):
            x, kv_pool, l = carry
            lp, use_rope = xs
            h = rms_norm(x, lp["input_norm"], eps)
            q = qmm(h, lp["wq"], "bed,dh->beh").reshape(
                B, E, c.num_attention_heads, c.head_dim
            )
            k = qmm(h, lp["wk"], "bed,dh->beh").reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            v = qmm(h, lp["wv"], "bed,dh->beh").reshape(
                B, E, c.num_key_value_heads, c.head_dim
            )
            qr, kr = apply_rope_cs(q, k, *rope_cs)
            q = jnp.where(use_rope > 0, qr, q)
            k = jnp.where(use_rope > 0, kr, k)
            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            x = x + qmm(
                att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed"
            )
            h2 = rms_norm(x, lp["post_norm"], eps)
            x = x + self._mlp(h2, lp)
            return (x, kv_pool, l + 1), None

        (x, new_kv, _), _ = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)),
            (params["layers"], self.rope_on),
        )
        x = rms_norm(x, params["final_norm"], eps)
        return x, new_kv


ENTRY_CLASS = SmolLM3ForCausalLM
