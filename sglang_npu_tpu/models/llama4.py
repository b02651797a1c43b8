"""Llama-4 (Scout/Maverick) text decoder.

Counterpart of the reference's `srt/models/llama4.py` (behavioral spec:
HF `modeling_llama4.py`):

  * per-layer NoPE (``no_rope_layers``, 1 = rope ON) with INTERLEAVED
    complex rotation on the rope layers (adjacent (re, im) pairs, not the
    neox half-split)
  * weightless L2 qk-norm AFTER rope on rope layers (``use_qk_norm``)
  * attention temperature tuning on NoPE layers: q is scaled by
    ``log1p(floor((pos+1)/floor_scale)) * attn_scale + 1``
  * chunked attention on rope layers (``attention_chunk_size``): queries
    attend only within their aligned chunk; NoPE layers are full causal
  * interleaved dense / MoE layers (``moe_layers``): top-k router whose
    sigmoid(top value) scales the expert INPUT (silu is nonlinear, so
    pre-scaling is not equivalent to combine-scaling), fused [E, D, 2F]
    half-split gate_up experts, plus an always-on shared expert; dense
    layers use ``intermediate_size_mlp``.

Layers are heterogeneous, so the model uses the per-layer Python-loop
trunk (zero-padded string keys) like `deepseek_v2.py`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import rms_norm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM
from sglang_npu_tpu.ops.xla_attention import paged_attention_xla, write_kv


def _lk(i: int) -> str:
    return f"layer_{i:03d}"


def _l2_norm(x, eps):
    x32 = x.astype(jnp.float32)
    return (
        x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    ).astype(x.dtype)


def llama4_experts(
    x,  # [T, D]
    gate_up,  # [E, D, 2F] (half-split: [:, :, :F] gate, [:, :, F:] up)
    down,  # [E, F, D]
    scores,  # [T, K] sigmoid(top-k logit) — scales the expert INPUT
    expert_ids,  # [T, K] i32
):
    """Dropless grouped llama4 expert compute (HF `Llama4TextExperts` +
    `Llama4TextMoe`: routed_in is pre-scaled, outputs summed unweighted)."""
    T, D = x.shape
    E = gate_up.shape[0]
    top_k = expert_ids.shape[-1]
    flat = expert_ids.reshape(-1)
    order = jnp.argsort(flat)
    token_idx = order // top_k
    sorted_x = x[token_idx] * scores.reshape(-1)[order][:, None].astype(x.dtype)
    group_sizes = jnp.bincount(flat, length=E)

    gu = jax.lax.ragged_dot(sorted_x, gate_up, group_sizes)
    gate, up = jnp.split(gu, 2, axis=-1)
    act = (jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)) * up
    out_sorted = jax.lax.ragged_dot(act, down, group_sizes)

    out_flat = jnp.zeros((T * top_k, D), out_sorted.dtype).at[order].set(
        out_sorted
    )
    return out_flat.reshape(T, top_k, D).sum(axis=1).astype(x.dtype)


class Llama4ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        c = config
        L = c.num_hidden_layers
        self.n_experts = hf.get("num_local_experts", 0) or 0
        self.top_k = hf.get("num_experts_per_tok", 1) or 1
        self.inter_mlp = hf.get("intermediate_size_mlp", c.intermediate_size)
        self.chunk = hf.get("attention_chunk_size", 0) or 0
        self.use_qk_norm = hf.get("use_qk_norm", False)
        self.temp_tuning = hf.get("attn_temperature_tuning", False)
        self.floor_scale = hf.get("floor_scale", 8192.0)
        self.attn_scale = hf.get("attn_scale", 0.1)
        rope_flags = hf.get("no_rope_layers")
        if not rope_flags:
            rope_flags = [int((i + 1) % 4 != 0) for i in range(L)]
        self.rope_on = [bool(f) for f in rope_flags]
        moe_layers = hf.get("moe_layers")
        if moe_layers is None:
            step = hf.get("interleave_moe_layer_step", 1)
            moe_layers = (
                list(range(step - 1, L, step)) if self.n_experts else []
            )
        self._moe_set = set(moe_layers)

    def _is_moe(self, i: int) -> bool:
        return i in self._moe_set

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        D, hd = c.hidden_size, c.head_dim
        H, Hkv = c.num_attention_heads, c.num_key_value_heads
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
                "wq": ((D, H * hd), dt),
                "wk": ((D, Hkv * hd), dt),
                "wv": ((D, Hkv * hd), dt),
                "wo": ((H * hd, D), dt),
            }
            if self._is_moe(i):
                E, F = self.n_experts, c.intermediate_size
                lp["router"] = ((D, E), jnp.float32)
                lp["e_gateup"] = ((E, D, 2 * F), dt)
                lp["e_down"] = ((E, F, D), dt)
                lp["s_gate"] = ((D, F), dt)
                lp["s_up"] = ((D, F), dt)
                lp["s_down"] = ((F, D), dt)
            else:
                F = self.inter_mlp
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
                # half-split gate/up: the 2F dim can't shard across the
                # gate/up boundary; shard the expert dim instead
                lp["e_gateup"] = P("model", None, None)
                lp["e_down"] = P("model", None, None)
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
            m[pre + "post_attention_layernorm.weight"] = (
                f"{k}.post_norm", None,
            )
            for hf_n, ours in (("q", "wq"), ("k", "wk"), ("v", "wv"),
                               ("o", "wo")):
                m[pre + f"self_attn.{hf_n}_proj.weight"] = (
                    f"{k}.{ours}", "transpose",
                )
            if self._is_moe(i):
                m[pre + "feed_forward.router.weight"] = (
                    f"{k}.router", "transpose",
                )
                # HF stores raw [E, D, 2F] / [E, F, D] parameters — our
                # orientation already
                m[pre + "feed_forward.experts.gate_up_proj"] = (
                    f"{k}.e_gateup", None,
                )
                m[pre + "feed_forward.experts.down_proj"] = (
                    f"{k}.e_down", None,
                )
                for hf_n, ours in (("gate", "s_gate"), ("up", "s_up"),
                                   ("down", "s_down")):
                    m[pre + f"feed_forward.shared_expert.{hf_n}_proj.weight"] = (
                        f"{k}.{ours}", "transpose",
                    )
            else:
                for hf_n, ours in (("gate", "w_gate"), ("up", "w_up"),
                                   ("down", "w_down")):
                    m[pre + f"feed_forward.{hf_n}_proj.weight"] = (
                        f"{k}.{ours}", "transpose",
                    )
        return m, {}

    # ------------------------------------------------------------------
    def _rope_pairs(self, x, positions):
        """Interleaved complex rotation (HF `apply_rotary_emb`): adjacent
        (even, odd) dims form (re, im) pairs."""
        cos = self.rope["cos"][positions][:, :, None, :]  # [B, E, 1, hd/2]
        sin = self.rope["sin"][positions][:, :, None, :]
        x32 = x.astype(jnp.float32)
        re, im = x32[..., 0::2], x32[..., 1::2]
        out_re = re * cos - im * sin
        out_im = re * sin + im * cos
        out = jnp.stack([out_re, out_im], axis=-1).reshape(x.shape)
        return out.astype(x.dtype)

    def backbone_forward(
        self, params, kv_pool, fb: ForwardBatch, page_size: int,
        collect_moe: bool = False, moe_mask=None,
    ):
        assert not collect_moe
        c = self.config
        B, E_ = fb.input_ids.shape
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        x = params["embed"][fb.input_ids].astype(dt)
        if fb.input_embeds is not None:
            # multimodal: image-token rows replaced by vision embeddings
            x = jnp.where(
                fb.embed_mask[..., None], fb.input_embeds.astype(x.dtype), x
            )
        eps = c.rms_norm_eps
        H, Hkv, hd = c.num_attention_heads, c.num_key_value_heads, c.head_dim

        if self.temp_tuning:
            pos = fb.positions.astype(jnp.float32)
            attn_scales = (
                jnp.log1p(jnp.floor((pos + 1.0) / self.floor_scale))
                * self.attn_scale
                + 1.0
            )[:, :, None, None]  # [B, E, 1, 1]

        for i in range(c.num_hidden_layers):
            lp = params[_lk(i)]
            use_rope = self.rope_on[i]
            h = rms_norm(x, lp["input_norm"], eps)
            q = jnp.einsum("bed,dh->beh", h, lp["wq"]).reshape(B, E_, H, hd)
            k = jnp.einsum("bed,dh->beh", h, lp["wk"]).reshape(
                B, E_, Hkv, hd
            )
            v = jnp.einsum("bed,dh->beh", h, lp["wv"]).reshape(
                B, E_, Hkv, hd
            )
            if use_rope:
                q = self._rope_pairs(q, fb.positions)
                k = self._rope_pairs(k, fb.positions)
                if self.use_qk_norm:
                    q = _l2_norm(q, eps)
                    k = _l2_norm(k, eps)
            elif self.temp_tuning:
                q = (q * attn_scales).astype(q.dtype)

            kv_pool = write_kv(kv_pool, jnp.int32(i), k, v, fb.out_slots)
            att = paged_attention_xla(
                q, kv_pool, jnp.int32(i), fb.page_tables, fb.seq_lens,
                fb.positions, page_size, self.scale,
                chunk_size=self.chunk if use_rope else 0,
            )
            x = x + jnp.einsum(
                "beh,hd->bed", att.reshape(B, E_, H * hd), lp["wo"]
            )

            h2 = rms_norm(x, lp["post_norm"], eps)
            if self._is_moe(i):
                flat = h2.reshape(B * E_, c.hidden_size)
                logits = jnp.einsum(
                    "td,de->te", flat.astype(jnp.float32), lp["router"]
                )
                vals, ids = jax.lax.top_k(logits, self.top_k)
                scores = jax.nn.sigmoid(vals)
                routed = llama4_experts(
                    flat, lp["e_gateup"], lp["e_down"], scores,
                    ids.astype(jnp.int32),
                )
                g = jnp.einsum("td,df->tf", flat, lp["s_gate"])
                u = jnp.einsum("td,df->tf", flat, lp["s_up"])
                shared = jnp.einsum(
                    "tf,fd->td", jax.nn.silu(g) * u, lp["s_down"]
                )
                x = x + (routed + shared).reshape(B, E_, c.hidden_size)
            else:
                g = jnp.einsum("bed,df->bef", h2, lp["w_gate"])
                u = jnp.einsum("bed,df->bef", h2, lp["w_up"])
                x = x + jnp.einsum(
                    "bef,fd->bed", jax.nn.silu(g) * u, lp["w_down"]
                )

        x = rms_norm(x, params["final_norm"], eps)
        return x, kv_pool


ENTRY_CLASS = Llama4ForCausalLM
