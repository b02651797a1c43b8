"""DeepSeek (v1) dense+MoE decoder — deepseek-moe-16b class.

Counterpart of the reference's `srt/models/deepseek.py:1`: standard GQA
rope attention (NOT MLA) with a heterogeneous MLP ladder — a layer is MoE
iff `layer_id >= first_k_dense_replace and layer_id % moe_layer_freq == 0`
(reference `deepseek.py:305-308`), softmax top-k routing with optional
renormalization (`norm_topk_prob`), and shared experts of width
`moe_intermediate_size * n_shared_experts` added WITHOUT a gate
(`deepseek.py:186`).

Like deepseek_v2, layers are heterogeneous, so the model keeps per-layer
param dicts and a Python layer loop instead of the stacked scan trunk."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.moe import moe_mlp
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM


def _lk(i: int) -> str:
    return f"layer_{i:03d}"


class DeepseekV1ForCausalLM(LlamaForCausalLM):
    merge_groups = ()  # per-layer dicts: load-time fusion not applicable

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.n_experts = hf.get("n_routed_experts") or 0
        self.top_k = hf.get("num_experts_per_tok", 2)
        self.moe_inter = hf.get("moe_intermediate_size", 0)
        self.norm_topk = bool(hf.get("norm_topk_prob", False))
        self.n_shared = hf.get("n_shared_experts") or 0
        self.first_dense = hf.get("first_k_dense_replace", 0)
        self.moe_freq = hf.get("moe_layer_freq", 1)

    def _is_moe(self, i: int) -> bool:
        return (
            self.n_experts > 0
            and i >= self.first_dense
            and i % self.moe_freq == 0
        )

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        D, F = c.hidden_size, c.intermediate_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        shapes: Dict[str, Any] = {
            "embed": ((c.vocab_size, D), dt),
            "final_norm": ((D,), jnp.float32),
        }
        if not c.tie_word_embeddings:
            shapes["lm_head"] = ((D, c.vocab_size), dt)
        for i in range(c.num_hidden_layers):
            lp: Dict[str, Any] = {
                "input_norm": ((D,), jnp.float32),
                "post_norm": ((D,), jnp.float32),
                "wq": ((D, self.q_size), dt),
                "wk": ((D, self.kv_size), dt),
                "wv": ((D, self.kv_size), dt),
                "wo": ((self.q_size, D), dt),
            }
            if self._is_moe(i):
                E, Fm = self.n_experts, self.moe_inter
                lp["router"] = ((D, E), jnp.float32)
                lp["e_gate"] = ((E, D, Fm), dt)
                lp["e_up"] = ((E, D, Fm), dt)
                lp["e_down"] = ((E, Fm, D), dt)
                if self.n_shared:
                    Fs = Fm * self.n_shared
                    lp["s_gate"] = ((D, Fs), dt)
                    lp["s_up"] = ((D, Fs), dt)
                    lp["s_down"] = ((Fs, D), dt)
            else:
                lp["w_gate"] = ((D, F), dt)
                lp["w_up"] = ((D, F), dt)
                lp["w_down"] = ((F, D), dt)
            shapes[_lk(i)] = lp
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        c = self.config
        specs: Dict[str, Any] = {
            "embed": P(None, "model"),
            "final_norm": P(None),
        }
        if not c.tie_word_embeddings:
            specs["lm_head"] = P(None, "model")
        for i in range(c.num_hidden_layers):
            lp = {
                "input_norm": P(None),
                "post_norm": P(None),
                "wq": P(None, "model"),
                "wk": P(None, "model"),
                "wv": P(None, "model"),
                "wo": P("model", None),
            }
            if self._is_moe(i):
                lp["router"] = P(None, None)
                lp["e_gate"] = P(None, None, "model")
                lp["e_up"] = P(None, None, "model")
                lp["e_down"] = P(None, "model", None)
                if self.n_shared:
                    lp["s_gate"] = P(None, "model")
                    lp["s_up"] = P(None, "model")
                    lp["s_down"] = P("model", None)
            else:
                lp["w_gate"] = P(None, "model")
                lp["w_up"] = P(None, "model")
                lp["w_down"] = P("model", None)
            specs[_lk(i)] = lp
        return specs

    def hf_weight_map(self):
        c = self.config
        m: Dict[str, tuple] = {
            "model.embed_tokens.weight": ("embed", None),
            "model.norm.weight": ("final_norm", None),
        }
        if not c.tie_word_embeddings:
            m["lm_head.weight"] = ("lm_head", "transpose")
        for i in range(c.num_hidden_layers):
            pre = f"model.layers.{i}."
            k = _lk(i)
            m[pre + "input_layernorm.weight"] = (f"{k}.input_norm", None)
            m[pre + "post_attention_layernorm.weight"] = (f"{k}.post_norm", None)
            m[pre + "self_attn.q_proj.weight"] = (f"{k}.wq", "transpose")
            m[pre + "self_attn.k_proj.weight"] = (f"{k}.wk", "transpose")
            m[pre + "self_attn.v_proj.weight"] = (f"{k}.wv", "transpose")
            m[pre + "self_attn.o_proj.weight"] = (f"{k}.wo", "transpose")
            if self._is_moe(i):
                m[pre + "mlp.gate.weight"] = (f"{k}.router", "transpose")
                for e in range(self.n_experts):
                    for hf_n, ours in (
                        ("gate_proj", "e_gate"),
                        ("up_proj", "e_up"),
                        ("down_proj", "e_down"),
                    ):
                        m[pre + f"mlp.experts.{e}.{hf_n}.weight"] = (
                            f"{k}.{ours}.__expert__{e}", "transpose",
                        )
                if self.n_shared:
                    m[pre + "mlp.shared_experts.gate_proj.weight"] = (
                        f"{k}.s_gate", "transpose",
                    )
                    m[pre + "mlp.shared_experts.up_proj.weight"] = (
                        f"{k}.s_up", "transpose",
                    )
                    m[pre + "mlp.shared_experts.down_proj.weight"] = (
                        f"{k}.s_down", "transpose",
                    )
            else:
                m[pre + "mlp.gate_proj.weight"] = (f"{k}.w_gate", "transpose")
                m[pre + "mlp.up_proj.weight"] = (f"{k}.w_up", "transpose")
                m[pre + "mlp.down_proj.weight"] = (f"{k}.w_down", "transpose")
        return m, {}

    def _ffn(self, lp, h):
        B, E_, Dm = h.shape
        flat = h.reshape(B * E_, Dm)
        if "router" in lp:
            out = moe_mlp(
                flat,
                lp["router"].astype(flat.dtype),
                lp["e_gate"], lp["e_up"], lp["e_down"],
                top_k=self.top_k,
                norm_topk_prob=self.norm_topk,
            )
            if self.n_shared:
                g = qmm(flat, lp["s_gate"], "td,df->tf")
                u = qmm(flat, lp["s_up"], "td,df->tf")
                out = out + qmm(
                    jax.nn.silu(g) * u, lp["s_down"], "tf,fd->td"
                )
            return out.reshape(B, E_, Dm)
        g = qmm(h, lp["w_gate"], "bed,df->bef")
        u = qmm(h, lp["w_up"], "bed,df->bef")
        return qmm(jax.nn.silu(g) * u, lp["w_down"], "bef,fd->bed")

    def backbone_forward(
        self, params, kv_pool, fb: ForwardBatch, page_size: int,
        collect_moe: bool = False, moe_mask=None, aux_after=None,
    ):
        assert not collect_moe and aux_after is None
        c = self.config
        B, E = fb.input_ids.shape
        x = params["embed"][fb.input_ids].astype(
            jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        )
        eps = c.rms_norm_eps
        from sglang_npu_tpu.layers.ops import rms_norm

        rope_cs = self._rope_cos_sin(fb)
        for i in range(c.num_hidden_layers):
            lp = params[_lk(i)]
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
            q, k = self.rope_apply(q, k, rope_cs)
            att, kv_pool = self._attention(
                q, k, v, kv_pool, jnp.int32(i), fb, page_size
            )
            x = x + qmm(
                att.reshape(B, E, self.q_size), lp["wo"], "beh,hd->bed"
            )
            h2 = rms_norm(x, lp["post_norm"], eps)
            x = x + self._ffn(lp, h2)
        x = rms_norm(x, params["final_norm"], eps)
        return x, kv_pool


ENTRY_CLASS = DeepseekV1ForCausalLM
