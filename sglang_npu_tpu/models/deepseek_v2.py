"""DeepSeek-V2 family: MLA attention + DeepSeek-MoE.

Counterpart of the reference's `srt/models/deepseek_v2.py` (MLA latent
attention, first-k-dense + shared-expert MoE, grouped top-k routing).

Design notes:
  * MLA runs in **latent-cache mode with absorbed matmuls** (the
    reference's memory-saving path, `MLATokenToKVPool:708` +
    `flashmla_backend.py`): only (c_kv, k_pe) = kv_lora_rank + rope dims
    are cached per token (~11x less KV than MHA-expanded for V2-Lite);
    attention is MQA against the shared latent with per-head q
    absorption (see `ops/mla_attention.py`).
  * Layers are heterogeneous (dense MLP for the first
    `first_k_dense_replace`, MoE after), so the model uses a Python loop
    with per-layer param dicts (zero-padded string keys) instead of the
    scan-over-stacked-layers trunk.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.moe import moe_mlp
from sglang_npu_tpu.layers.ops import make_rope_tables, rms_norm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM
from sglang_npu_tpu.ops.mla_attention import mla_attention_xla, write_latent


def _lk(i: int) -> str:
    return f"layer_{i:03d}"


class DeepseekV2ForCausalLM(LlamaForCausalLM):
    ep_size = 1  # >1: expert-parallel placement (set by ModelRunner)
    ep_mesh = None
    num_experts = 0  # alias for the runner's EP validation
    num_redundant = 0  # EPLB redundant physical expert slots
    dp_attn_mesh = None  # DP-attention over the latent pool (ModelRunner)

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        c = config
        self.qk_nope = c.qk_nope_head_dim
        self.qk_rope = c.qk_rope_head_dim
        self.v_dim = c.v_head_dim
        self.kv_rank = c.kv_lora_rank
        self.q_rank = c.q_lora_rank
        self.k_dim = self.qk_nope + self.qk_rope  # cached K width (=head_dim)
        self.scale = self.k_dim**-0.5
        self.n_heads = c.num_attention_heads

        self.first_dense = hf.get("first_k_dense_replace", 0)
        self.n_experts = hf.get("n_routed_experts", 0) or 0
        self.n_shared = hf.get("n_shared_experts", 0) or 0
        self.top_k = hf.get("num_experts_per_tok", 0) or 0
        self.moe_inter = hf.get("moe_intermediate_size", 0) or 0
        self.routed_scaling = hf.get("routed_scaling_factor", 1.0)
        self.norm_topk = hf.get("norm_topk_prob", False)
        self.num_experts = self.n_experts
        # DeepSeek-V3/R1: noaux_tc sigmoid router with a learned correction
        # bias and group-restricted selection (HF DeepseekV3TopkRouter);
        # V2-class checkpoints keep softmax greedy top-k
        self.is_v3 = (
            hf.get("model_type") == "deepseek_v3"
            or "DeepseekV3ForCausalLM" in (config.architectures or [])
            or hf.get("topk_method") == "noaux_tc"
        )
        self.n_group = hf.get("n_group", 1) or 1
        self.topk_group = hf.get("topk_group", 1) or 1
        self.rope_interleave = hf.get("rope_interleave", True)

        self.rope = make_rope_tables(
            self.qk_rope,
            max(c.context_length, c.max_position_embeddings),
            c.rope_theta,
            c.rope_scaling,
        )

    def _is_moe(self, i: int) -> bool:
        return self.n_experts > 0 and i >= self.first_dense

    # ------------------------------------------------------------------
    # EPLB hooks (reference `srt/eplb/eplb_manager.py`) — per-layer param
    # dicts (the model runs a Python layer loop, not a scan)
    # ------------------------------------------------------------------
    def eplb_layer_count(self) -> int:
        return sum(
            self._is_moe(i) for i in range(self.config.num_hidden_layers)
        )

    def _moe_layer_ids(self):
        return [
            i
            for i in range(self.config.num_hidden_layers)
            if self._is_moe(i)
        ]

    def eplb_install_tables(self, params, l2p, rc):
        params = dict(params)
        for j, i in enumerate(self._moe_layer_ids()):
            params[_lk(i)] = {
                **params[_lk(i)],
                "eplb_l2p": l2p[j],  # [E, R]
                "eplb_rc": rc[j],  # [E]
            }
        return params

    def eplb_permute(self, params, gather, l2p, rc):
        params = dict(params)
        for j, i in enumerate(self._moe_layer_ids()):
            lp = dict(params[_lk(i)])
            g = gather[j].astype(jnp.int32)  # [P]
            for k in ("e_gate", "e_up", "e_down"):
                lp[k] = jax.tree.map(
                    lambda a: jax.device_put(
                        jnp.take(a, g, axis=0), a.sharding
                    ),
                    lp[k],
                )
            lp["eplb_l2p"] = jax.device_put(l2p[j], lp["eplb_l2p"].sharding)
            lp["eplb_rc"] = jax.device_put(rc[j], lp["eplb_rc"].sharding)
            params[_lk(i)] = lp
        return params

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        D = c.hidden_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        shapes: Dict[str, Any] = {
            "embed": ((c.vocab_size, D), dt),
            "final_norm": ((D,), jnp.float32),
        }
        if not c.tie_word_embeddings:
            shapes["lm_head"] = ((D, c.vocab_size), dt)
        H, F = self.n_heads, c.intermediate_size
        for i in range(c.num_hidden_layers):
            lp: Dict[str, Any] = {
                "input_norm": ((D,), jnp.float32),
                "post_norm": ((D,), jnp.float32),
                "kv_a": ((D, self.kv_rank + self.qk_rope), dt),
                "kv_a_norm": ((self.kv_rank,), jnp.float32),
                "kv_b": ((self.kv_rank, H * (self.qk_nope + self.v_dim)), dt),
                "wo": ((H * self.v_dim, D), dt),
            }
            if self.q_rank:
                lp["q_a"] = ((D, self.q_rank), dt)
                lp["q_a_norm"] = ((self.q_rank,), jnp.float32)
                lp["q_b"] = ((self.q_rank, H * self.k_dim), dt)
            else:
                lp["wq"] = ((D, H * self.k_dim), dt)
            if self._is_moe(i):
                E, Fm = self.n_experts, self.moe_inter
                P_slots = E + self.num_redundant  # EPLB physical slots
                lp["router"] = ((D, E), jnp.float32)
                if self.is_v3:
                    lp["router_bias"] = ((E,), jnp.float32)
                lp["e_gate"] = ((P_slots, D, Fm), dt)
                lp["e_up"] = ((P_slots, D, Fm), dt)
                lp["e_down"] = ((P_slots, Fm, D), dt)
                if self.n_shared:
                    Fs = self.moe_inter * self.n_shared
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
                "kv_a": P(None, None),
                "kv_a_norm": P(None),
                "kv_b": P(None, "model"),
                "wo": P("model", None),
            }
            if self.q_rank:
                lp["q_a"] = P(None, None)
                lp["q_a_norm"] = P(None)
                lp["q_b"] = P(None, "model")
            else:
                lp["wq"] = P(None, "model")
            if self._is_moe(i):
                lp["router"] = P(None, None)
                if self.is_v3:
                    lp["router_bias"] = P(None)
                if self.ep_size > 1:
                    lp["e_gate"] = P("model", None, None)
                    lp["e_up"] = P("model", None, None)
                    lp["e_down"] = P("model", None, None)
                else:
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
            m[pre + "self_attn.kv_a_proj_with_mqa.weight"] = (f"{k}.kv_a", "transpose")
            m[pre + "self_attn.kv_a_layernorm.weight"] = (f"{k}.kv_a_norm", None)
            m[pre + "self_attn.kv_b_proj.weight"] = (f"{k}.kv_b", "transpose")
            m[pre + "self_attn.o_proj.weight"] = (f"{k}.wo", "transpose")
            if self.q_rank:
                m[pre + "self_attn.q_a_proj.weight"] = (f"{k}.q_a", "transpose")
                m[pre + "self_attn.q_a_layernorm.weight"] = (f"{k}.q_a_norm", None)
                m[pre + "self_attn.q_b_proj.weight"] = (f"{k}.q_b", "transpose")
            else:
                m[pre + "self_attn.q_proj.weight"] = (f"{k}.wq", "transpose")
            if self._is_moe(i):
                m[pre + "mlp.gate.weight"] = (f"{k}.router", "transpose")
                if self.is_v3:
                    m[pre + "mlp.gate.e_score_correction_bias"] = (
                        f"{k}.router_bias", None,
                    )
                for e in range(self.n_experts):
                    m[pre + f"mlp.experts.{e}.gate_proj.weight"] = (
                        f"{k}.e_gate.__expert__{e}",
                        "transpose",
                    )
                    m[pre + f"mlp.experts.{e}.up_proj.weight"] = (
                        f"{k}.e_up.__expert__{e}",
                        "transpose",
                    )
                    m[pre + f"mlp.experts.{e}.down_proj.weight"] = (
                        f"{k}.e_down.__expert__{e}",
                        "transpose",
                    )
                if self.n_shared:
                    m[pre + "mlp.shared_experts.gate_proj.weight"] = (
                        f"{k}.s_gate",
                        "transpose",
                    )
                    m[pre + "mlp.shared_experts.up_proj.weight"] = (
                        f"{k}.s_up",
                        "transpose",
                    )
                    m[pre + "mlp.shared_experts.down_proj.weight"] = (
                        f"{k}.s_down",
                        "transpose",
                    )
            else:
                m[pre + "mlp.gate_proj.weight"] = (f"{k}.w_gate", "transpose")
                m[pre + "mlp.up_proj.weight"] = (f"{k}.w_up", "transpose")
                m[pre + "mlp.down_proj.weight"] = (f"{k}.w_down", "transpose")
        return m, {}

    # ------------------------------------------------------------------
    def _rope_interleaved(self, x, positions):
        """DeepSeek rope: checkpoints usually store pe dims interleaved —
        de-interleave, rotate (neox), matching HF's b/h permutation;
        `rope_interleave: false` configs (some V3 exports) skip the
        de-interleave."""
        B, E, H, R = x.shape
        if self.rope_interleave:
            x = x.reshape(B, E, H, R // 2, 2)
            x = jnp.concatenate([x[..., 0], x[..., 1]], axis=-1)
        cos = self.rope["cos"][positions][:, :, None, :]
        sin = self.rope["sin"][positions][:, :, None, :]
        x32 = x.astype(jnp.float32)
        x1, x2 = jnp.split(x32, 2, axis=-1)
        out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)
        return out.astype(x.dtype)

    def _mla_qkv(self, lp, h, positions):
        """Shared MLA projection math: returns the absorbed queries and
        the latent row to cache — (q_abs [B,E,H,R], q_pe [B,E,H,rope],
        c_kv [B,E,R], k_pe [B,E,rope], w_kb_v [R,H,v_dim])."""
        eps = self.config.rms_norm_eps
        B, E = h.shape[:2]
        H = self.n_heads
        if self.q_rank:
            qa = jnp.einsum("bed,dr->ber", h, lp["q_a"])
            qa = rms_norm(qa, lp["q_a_norm"], eps)
            q = jnp.einsum("ber,rh->beh", qa, lp["q_b"])
        else:
            q = jnp.einsum("bed,dh->beh", h, lp["wq"])
        q = q.reshape(B, E, H, self.k_dim)
        q_nope, q_pe = q[..., : self.qk_nope], q[..., self.qk_nope :]

        kv_a = jnp.einsum("bed,dr->ber", h, lp["kv_a"])
        c_kv, k_pe = (
            kv_a[..., : self.kv_rank],
            kv_a[..., self.kv_rank :],
        )
        c_kv = rms_norm(c_kv, lp["kv_a_norm"], eps)

        q_pe = self._rope_interleaved(q_pe, positions)
        k_pe = self._rope_interleaved(
            k_pe[:, :, None, :], positions
        )[:, :, 0, :]  # [B, E, rope]

        # absorbed attention against the latent cache: cache (c_kv,
        # k_pe) only; per-head K up-projection folds into the query,
        # V up-projection folds into the output
        w_kb = lp["kv_b"].reshape(
            self.kv_rank, H, self.qk_nope + self.v_dim
        )
        w_kb_k = w_kb[..., : self.qk_nope]  # [R, H, nope]
        w_kb_v = w_kb[..., self.qk_nope :]  # [R, H, v_dim]
        q_abs = jnp.einsum("behn,rhn->behr", q_nope, w_kb_k)  # [B, E, H, R]
        return q_abs, q_pe, c_kv, k_pe, w_kb_v

    def _ffn(self, lp, h2, i, collect_stats=False, stats_mask=None):
        """Post-attention MLP / MoE block (returns the residual delta;
        with ``collect_stats`` on a MoE layer, (delta, counts[E]))."""
        c = self.config
        B, E = h2.shape[:2]
        if self._is_moe(i):
            flat = h2.reshape(B * E, c.hidden_size)
            stats = None
            routing_fn = None
            if self.is_v3:
                from sglang_npu_tpu.layers.moe import (
                    sigmoid_group_topk_routing,
                )

                bias = lp["router_bias"]

                def routing_fn(logits):
                    return sigmoid_group_topk_routing(
                        logits, bias, self.top_k,
                        n_group=self.n_group, topk_group=self.topk_group,
                        norm_topk_prob=self.norm_topk,
                        routed_scaling=self.routed_scaling,
                    )

            if self.ep_size > 1:
                from sglang_npu_tpu.layers.moe import ep_moe

                out = ep_moe(
                    flat,
                    lp["router"].astype(flat.dtype),
                    lp["e_gate"],
                    lp["e_up"],
                    lp["e_down"],
                    top_k=self.top_k,
                    norm_topk_prob=self.norm_topk,
                    mesh=self.ep_mesh,
                    l2p=lp.get("eplb_l2p"),
                    rc=lp.get("eplb_rc"),
                    collect_stats=collect_stats,
                    stats_mask=stats_mask,
                    routing_fn=routing_fn,
                )
            elif self.is_v3:
                from sglang_npu_tpu.layers.moe import moe_apply

                logits = jnp.einsum(
                    "td,de->te", flat, lp["router"],
                    preferred_element_type=jnp.float32,
                )
                weights, ids = routing_fn(logits)
                out = moe_apply(
                    flat, lp["e_gate"], lp["e_up"], lp["e_down"],
                    weights, ids,
                )
                if collect_stats:
                    from sglang_npu_tpu.layers.moe import routing_counts

                    out = (out, routing_counts(
                        ids, self.n_experts, stats_mask
                    ))
            else:
                out = moe_mlp(
                    flat,
                    lp["router"].astype(flat.dtype),
                    lp["e_gate"],
                    lp["e_up"],
                    lp["e_down"],
                    top_k=self.top_k,
                    norm_topk_prob=self.norm_topk,
                    collect_stats=collect_stats,
                    stats_mask=stats_mask,
                )
            if collect_stats:
                out, stats = out
            # V3's routed_scaling is already inside the routing weights
            if not self.is_v3:
                out = out * jnp.asarray(self.routed_scaling, flat.dtype)
            if self.n_shared:
                g = jnp.einsum("td,df->tf", flat, lp["s_gate"])
                u = jnp.einsum("td,df->tf", flat, lp["s_up"])
                out = out + jnp.einsum(
                    "tf,fd->td", jax.nn.silu(g) * u, lp["s_down"]
                )
            out = out.reshape(B, E, c.hidden_size)
            return (out, stats) if collect_stats else out
        g = jnp.einsum("bed,df->bef", h2, lp["w_gate"])
        u = jnp.einsum("bed,df->bef", h2, lp["w_up"])
        out = jnp.einsum("bef,fd->bed", jax.nn.silu(g) * u, lp["w_down"])
        return (out, None) if collect_stats else out

    def backbone_forward(
        self, params, kv_pool, fb: ForwardBatch, page_size: int,
        collect_moe: bool = False, moe_mask=None,
    ):
        c = self.config
        moe_stats = []
        smask = (
            jnp.repeat(moe_mask, fb.input_ids.shape[1])
            if collect_moe and moe_mask is not None
            else None
        )
        B, E = fb.input_ids.shape
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        x = params["embed"][fb.input_ids].astype(dt)
        if fb.input_embeds is not None:
            # multimodal splice (deepseek-vl2 class): vision rows replace
            # their image-token embeddings
            x = jnp.where(
                fb.embed_mask[..., None], fb.input_embeds.astype(x.dtype), x
            )
        if self.embedding_multiplier != 1.0:
            x = x * jnp.asarray(self.embedding_multiplier, x.dtype)
        rm = self.residual_multiplier
        eps = c.rms_norm_eps
        H = self.n_heads

        for i in range(c.num_hidden_layers):
            lp = params[_lk(i)]
            h = rms_norm(x, lp["input_norm"], eps)
            q_abs, q_pe, c_kv, k_pe, w_kb_v = self._mla_qkv(
                lp, h, fb.positions
            )

            if self.dp_attn_mesh is not None:
                from sglang_npu_tpu.model_executor.dp_attention import (
                    dp_mla_attention,
                )

                ctx, kv_pool = dp_mla_attention(
                    self.dp_attn_mesh, q_abs, q_pe, c_kv, k_pe, kv_pool,
                    jnp.int32(i), fb, page_size, self.scale,
                    use_pallas=getattr(self, "use_pallas_mla", False),
                )
            elif E == 1 and getattr(self, "use_pallas_mla", False):
                # decode: fused latent-write + flash attention kernel
                # (ops/pallas/mla_decode_kernel.py) — streams only the live
                # (ckv, kpe) pages instead of gathering the padded page
                # table, and keeps the pool out of XLA scatter-land
                from sglang_npu_tpu.ops.pallas.mla_decode_kernel import (
                    mla_paged_decode_fused,
                )

                import os

                ctx1, kv_pool = mla_paged_decode_fused(
                    q_abs[:, 0],
                    q_pe[:, 0],
                    c_kv[:, 0],
                    k_pe[:, 0],
                    kv_pool,
                    jnp.int32(i),
                    fb.page_tables,
                    fb.seq_lens,
                    page_size,
                    self.scale,
                    interpret=bool(
                        os.environ.get("SGLANG_TPU_PALLAS_INTERPRET")
                    ),
                )
                ctx = ctx1[:, None]  # [B, 1, H, R]
            else:
                kv_pool = write_latent(
                    kv_pool, jnp.int32(i), c_kv, k_pe, fb.out_slots
                )
                ctx = mla_attention_xla(
                    q_abs,
                    q_pe,
                    kv_pool,
                    jnp.int32(i),
                    fb.page_tables,
                    fb.seq_lens,
                    fb.positions,
                    page_size,
                    self.scale,
                )  # [B, E, H, R]
            att = jnp.einsum("behr,rhv->behv", ctx, w_kb_v)
            att_out = jnp.einsum(
                "beh,hd->bed", att.reshape(B, E, H * self.v_dim), lp["wo"]
            )
            x = x + (
                att_out if rm == 1.0 else att_out * jnp.asarray(rm, x.dtype)
            )

            # ---- MLP / MoE ----
            h2 = rms_norm(x, lp["post_norm"], eps)
            if collect_moe:
                delta, stats = self._ffn(
                    lp, h2, i, collect_stats=True, stats_mask=smask
                )
                x = x + (
                    delta if rm == 1.0 else delta * jnp.asarray(rm, x.dtype)
                )
                if stats is not None:
                    moe_stats.append(stats)
            else:
                delta = self._ffn(lp, h2, i)
                x = x + (
                    delta if rm == 1.0 else delta * jnp.asarray(rm, x.dtype)
                )

        x = rms_norm(x, params["final_norm"], eps)
        if collect_moe:
            # [n_moe_layers, E], MoE layers in depth order
            return x, kv_pool, jnp.stack(moe_stats)
        return x, kv_pool

    def verify_forward(
        self,
        params: Dict[str, Any],
        kv_pool,
        fb: ForwardBatch,
        page_size: int,
        tree_mask: jax.Array,  # [T, T] bool ancestor-or-self
    ):
        """Speculative tree-verify trunk over the latent pool (reference
        TARGET_VERIFY, `eagle_worker.py:668`, with MLA): the fed tokens
        attend the committed latent prefix plus in-flight ancestors; the
        pool is NOT written.  Returns (hidden [B, T, D],
        (ckv_stack [L, B, T, R], kpe_stack [L, B, T, rope])) — the
        per-layer fed latents so the runner can commit accepted rows."""
        from sglang_npu_tpu.ops.mla_attention import (
            tree_verify_mla_attention_xla,
        )

        c = self.config
        B, T = fb.input_ids.shape
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        x = params["embed"][fb.input_ids].astype(dt)
        eps = c.rms_norm_eps
        H = self.n_heads
        ckv_layers, kpe_layers = [], []

        for i in range(c.num_hidden_layers):
            lp = params[_lk(i)]
            h = rms_norm(x, lp["input_norm"], eps)
            q_abs, q_pe, c_kv, k_pe, w_kb_v = self._mla_qkv(
                lp, h, fb.positions
            )
            ckv_layers.append(c_kv)
            kpe_layers.append(k_pe)
            ctx = tree_verify_mla_attention_xla(
                q_abs, q_pe, c_kv, k_pe, kv_pool, jnp.int32(i),
                fb.page_tables, fb.extend_prefix_lens, tree_mask,
                page_size, self.scale,
            )
            att = jnp.einsum("behr,rhv->behv", ctx, w_kb_v)
            x = x + jnp.einsum(
                "beh,hd->bed", att.reshape(B, T, H * self.v_dim), lp["wo"]
            )
            h2 = rms_norm(x, lp["post_norm"], eps)
            x = x + self._ffn(lp, h2, i)

        x = rms_norm(x, params["final_norm"], eps)
        return x, (jnp.stack(ckv_layers), jnp.stack(kpe_layers))
