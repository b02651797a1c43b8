"""Gemma-3n text decoder (MatFormer-class E2B/E4B).

Behavioral counterpart of the reference's `srt/models/gemma3n_causal.py`
(HF spec `modeling_gemma3n.py`):

  * **AltUp** (alternating updates): the residual stream is a stack of
    ``altup_num_inputs`` branches; each layer PREDICTS all branches from
    a tanh modality router over the active branch, runs the transformer
    sublayers on the active prediction only, then CORRECTS every branch
    with the innovation (activated - prediction) scaled per branch.
  * **LAuReL** (learned augmented residual): low-rank ``D -> r -> D``
    bypass around attention, merged as ``(attn + laurel)/sqrt(2)``.
  * **Per-layer inputs**: a second, narrow embedding table (``P =
    hidden_size_per_layer_input``) plus a projection of the main embeds
    feeds a gated ``D -> P -> D`` update into the NON-active branches.
  * **KV sharing**: the last ``num_kv_shared_layers`` layers compute
    q only and attend over the KV of the last NON-shared layer of the
    same attention type (full/sliding) — those layers write no KV.
  * sliding/full layer mix with separate local/global rope, q/k rms norm
    (plain-weight convention), scale-free v norm, attention scale 1.0,
    gaussian-topk activation sparsity on the gate, gelu-tanh, final
    logit softcapping, sqrt(D)-scaled embeddings.
"""

from __future__ import annotations

from statistics import NormalDist
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import apply_rope, make_rope_tables, rms_norm
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM
from sglang_npu_tpu.ops.xla_attention import paged_attention_xla, write_kv


def _rms_noscale(x, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class Gemma3nForCausalLM(LlamaForCausalLM):
    merge_groups = ()  # heterogeneous trunk: keep projections unfused

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        c = config
        L = c.num_hidden_layers
        self.A = hf.get("altup_num_inputs", 4)
        self.active = hf.get("altup_active_idx", 0)
        self.correct_scale = hf.get("altup_correct_scale", True)
        self.P = hf.get("hidden_size_per_layer_input", 256)
        # HF omits tie_word_embeddings from saved gemma3n configs (its
        # default is True); an untied head would load as zeros
        config.tie_word_embeddings = bool(
            hf.get("tie_word_embeddings", True)
        )
        self.vocab_pl = hf.get("vocab_size_per_layer_input", c.vocab_size)
        self.laurel_rank = hf.get("laurel_rank", 64)
        self.final_softcap = hf.get("final_logit_softcapping", 30.0) or 0.0
        self.scale = 1.0  # Gemma3n attends unscaled (HF scaling=1.0)

        inter = hf.get("intermediate_size")
        if isinstance(inter, (list, tuple)):
            assert len(set(inter)) == 1, (
                "per-layer intermediate sizes not supported yet"
            )
            self.inter = int(inter[0])
        else:
            self.inter = int(inter)

        layer_types = hf.get("layer_types") or [
            "sliding_attention" if (i + 1) % 5 else "full_attention"
            for i in range(L)
        ]
        self.sliding_flags = [t == "sliding_attention" for t in layer_types]
        self.sliding_window = hf.get("sliding_window", 512)

        # KV sharing plan: shared layers read the pool slot of the last
        # non-shared layer of their type and skip the write
        shared = hf.get("num_kv_shared_layers", 0) or 0
        first_shared = L - shared
        kv_src, kv_write = [], []
        for i in range(L):
            if shared and i >= first_shared > 0:
                prev = layer_types[:first_shared]
                src = (
                    len(prev) - 1 - prev[::-1].index(layer_types[i])
                )
                kv_src.append(src)
                kv_write.append(False)
            else:
                kv_src.append(i)
                kv_write.append(True)
        self.kv_src = kv_src
        self.kv_write = kv_write

        # activation sparsity: std multiplier icdf(p) per layer
        pat = hf.get("activation_sparsity_pattern")
        if pat is None:
            pat = [0.0] * L
        self.sparsity_mult = [
            NormalDist().inv_cdf(p) if p > 0 else 0.0 for p in pat
        ]
        self.sparsity_on = [p > 0 for p in pat]

        maxp = max(config.context_length, config.max_position_embeddings)
        self.rope_global = make_rope_tables(
            c.head_dim, maxp, c.rope_theta, None
        )
        self.rope_local = make_rope_tables(
            c.head_dim, maxp, hf.get("rope_local_base_freq", 10000.0), None
        )

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        D, hd = c.hidden_size, c.head_dim
        H, Hkv = c.num_attention_heads, c.num_key_value_heads
        L, A, Pd, F = c.num_hidden_layers, self.A, self.P, self.inter
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        shapes: Dict[str, Any] = {
            "embed": ((c.vocab_size, D), dt),
            "embed_per_layer": ((self.vocab_pl, L * Pd), dt),
            "plm_proj": ((D, L * Pd), dt),
            "pl_proj_norm": ((Pd,), jnp.float32),
            "final_norm": ((D,), jnp.float32),
        }
        for j in range(1, A):
            shapes[f"altup_proj_{j}"] = ((D, D), dt)
            shapes[f"altup_unembed_{j}"] = ((D, D), dt)
        if not c.tie_word_embeddings:
            shapes["lm_head"] = ((D, c.vocab_size), dt)
        shapes["layers"] = {
            "input_norm": ((L, D), jnp.float32),
            "post_attn_norm": ((L, D), jnp.float32),
            "pre_ffw_norm": ((L, D), jnp.float32),
            "post_ffw_norm": ((L, D), jnp.float32),
            "wq": ((L, D, H * hd), dt),
            "wk": ((L, D, Hkv * hd), dt),
            "wv": ((L, D, Hkv * hd), dt),
            "wo": ((L, H * hd, D), dt),
            "q_norm": ((L, hd), jnp.float32),
            "k_norm": ((L, hd), jnp.float32),
            "w_gate": ((L, D, F), dt),
            "w_up": ((L, D, F), dt),
            "w_down": ((L, F, D), dt),
            "laurel_left": ((L, D, self.laurel_rank), dt),
            "laurel_right": ((L, self.laurel_rank, D), dt),
            "laurel_norm": ((L, D), jnp.float32),
            "altup_router": ((L, D, A), dt),
            "altup_router_norm": ((L, D), jnp.float32),
            "altup_pred_coefs": ((L, A, A * A), jnp.float32),
            "altup_corr_coefs": ((L, A, A), jnp.float32),
            "altup_out_scale": ((L, D), jnp.float32),
            "pli_gate": ((L, D, Pd), dt),
            "pli_proj": ((L, Pd, D), dt),
            "pli_norm": ((L, D), jnp.float32),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        c = self.config
        specs: Dict[str, Any] = {
            "embed": P(None, "model"),
            "embed_per_layer": P(None, None),
            "plm_proj": P(None, None),
            "pl_proj_norm": P(None),
            "final_norm": P(None),
        }
        for j in range(1, self.A):
            specs[f"altup_proj_{j}"] = P(None, None)
            specs[f"altup_unembed_{j}"] = P(None, None)
        if not c.tie_word_embeddings:
            specs["lm_head"] = P(None, "model")
        lp = {
            "wq": P(None, None, "model"),
            "wk": P(None, None, "model"),
            "wv": P(None, None, "model"),
            "wo": P(None, "model", None),
            "w_gate": P(None, None, "model"),
            "w_up": P(None, None, "model"),
            "w_down": P(None, "model", None),
        }
        for k, (shp, _dt) in self.param_shapes()["layers"].items():
            if k not in lp:
                lp[k] = P(*([None] * len(shp)))
        specs["layers"] = lp
        return specs

    def hf_weight_map(self):
        c = self.config
        top = {
            "model.embed_tokens.weight": ("embed", None),
            "model.embed_tokens_per_layer.weight": ("embed_per_layer", None),
            "model.per_layer_model_projection.weight": (
                "plm_proj", "transpose",
            ),
            # HF's save-time "model.language_model"->"model" rename is a
            # plain string replace that also mangles the "model" inside
            # per_layer_MODEL_projection; accept the mangled form too
            "model.per_layer_model.language_model_projection.weight": (
                "plm_proj", "transpose",
            ),
            "model.per_layer_projection_norm.weight": ("pl_proj_norm", None),
            "model.norm.weight": ("final_norm", None),
        }
        for j in range(1, self.A):
            top[f"model.altup_projections.{j - 1}.weight"] = (
                f"altup_proj_{j}", "transpose",
            )
            top[f"model.altup_unembed_projections.{j - 1}.weight"] = (
                f"altup_unembed_{j}", "transpose",
            )
        if not c.tie_word_embeddings:
            top["lm_head.weight"] = ("lm_head", "transpose")
        pl = {
            "input_layernorm.weight": ("layers.input_norm", None),
            "post_attention_layernorm.weight": ("layers.post_attn_norm", None),
            "pre_feedforward_layernorm.weight": ("layers.pre_ffw_norm", None),
            "post_feedforward_layernorm.weight": ("layers.post_ffw_norm", None),
            "self_attn.q_proj.weight": ("layers.wq", "transpose"),
            "self_attn.k_proj.weight": ("layers.wk", "transpose"),
            "self_attn.v_proj.weight": ("layers.wv", "transpose"),
            "self_attn.o_proj.weight": ("layers.wo", "transpose"),
            "self_attn.q_norm.weight": ("layers.q_norm", None),
            "self_attn.k_norm.weight": ("layers.k_norm", None),
            "mlp.gate_proj.weight": ("layers.w_gate", "transpose"),
            "mlp.up_proj.weight": ("layers.w_up", "transpose"),
            "mlp.down_proj.weight": ("layers.w_down", "transpose"),
            "laurel.linear_left.weight": ("layers.laurel_left", "transpose"),
            "laurel.linear_right.weight": ("layers.laurel_right", "transpose"),
            "laurel.post_laurel_norm.weight": ("layers.laurel_norm", None),
            "altup.modality_router.weight": ("layers.altup_router", "transpose"),
            "altup.router_norm.weight": ("layers.altup_router_norm", None),
            "altup.prediction_coefs.weight": (
                "layers.altup_pred_coefs", "transpose",
            ),
            "altup.correction_coefs.weight": (
                "layers.altup_corr_coefs", "transpose",
            ),
            "altup.correct_output_scale": ("layers.altup_out_scale", None),
            "per_layer_input_gate.weight": ("layers.pli_gate", "transpose"),
            "per_layer_projection.weight": ("layers.pli_proj", "transpose"),
            "post_per_layer_input_norm.weight": ("layers.pli_norm", None),
        }
        return top, pl

    # ------------------------------------------------------------------
    def logits_from_hidden(self, params, last):
        logits = super().logits_from_hidden(params, last)
        if self.final_softcap > 0:
            logits = self.final_softcap * jnp.tanh(
                logits / self.final_softcap
            )
        return logits

    def _router(self, h, lp, eps):
        """tanh modality router over a normed, 1/D-scaled input."""
        r = rms_norm(h, lp["altup_router_norm"], eps) * jnp.asarray(
            1.0 / self.config.hidden_size, h.dtype
        )
        routed = qmm(r, lp["altup_router"], "bed,da->bea")
        return jnp.tanh(routed.astype(jnp.float32)).astype(h.dtype)

    def _magnitude_match(self, ref, x):
        """Scale x rows to ref's rms magnitude (HF altup projections)."""
        tgt = jnp.sqrt(
            jnp.mean(
                ref.astype(jnp.float32) ** 2, axis=-1, keepdims=True
            )
        )
        new = jnp.sqrt(
            jnp.maximum(
                jnp.mean(
                    x.astype(jnp.float32) ** 2, axis=-1, keepdims=True
                ),
                1e-5,
            )
        )
        return (x.astype(jnp.float32) * tgt / new).astype(x.dtype)

    def backbone_forward(
        self, params, kv_pool, fb: ForwardBatch, page_size: int,
        collect_moe: bool = False, moe_mask=None,
    ):
        assert not collect_moe
        c = self.config
        B, E = fb.input_ids.shape
        L, A, Pd = c.num_hidden_layers, self.A, self.P
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        eps = c.rms_norm_eps
        H, Hkv, hd = c.num_attention_heads, c.num_key_value_heads, c.head_dim

        x0 = params["embed"][fb.input_ids].astype(dt) * jnp.asarray(
            c.hidden_size**0.5, dt
        )
        if fb.input_embeds is not None:
            x0 = jnp.where(
                fb.embed_mask[..., None], fb.input_embeds.astype(dt), x0
            )

        # per-layer inputs [B, E, L, P]
        pli_ids = jnp.minimum(fb.input_ids, self.vocab_pl - 1)
        pli_emb = params["embed_per_layer"][pli_ids].astype(dt) * jnp.asarray(
            Pd**0.5, dt
        )
        pli_emb = pli_emb.reshape(B, E, L, Pd)
        proj = qmm(x0, params["plm_proj"], "bed,dp->bep") * jnp.asarray(
            c.hidden_size**-0.5, dt
        )
        proj = rms_norm(
            proj.reshape(B, E, L, Pd), params["pl_proj_norm"], eps
        )
        per_layer = (proj + pli_emb) * jnp.asarray(2.0**-0.5, dt)

        # altup branch init: magnitude-matched projections of branch 0
        branches = [x0]
        for j in range(1, A):
            pj = qmm(x0, params[f"altup_proj_{j}"], "bed,df->bef")
            branches.append(self._magnitude_match(x0, pj))
        hs = jnp.stack(branches)  # [A, B, E, D]

        flags = jnp.asarray(self.sliding_flags)
        kv_src = jnp.asarray(self.kv_src, jnp.int32)
        kv_wr = jnp.asarray(self.kv_write)
        sp_on = jnp.asarray(self.sparsity_on)
        sp_mult = jnp.asarray(self.sparsity_mult, jnp.float32)
        pl_xs = per_layer.transpose(2, 0, 1, 3)  # [L, B, E, P]

        def layer_fn(carry, xs):
            hs, pool = carry
            lp, sliding, src, wr, s_on, s_mult, pli = xs

            # ---- AltUp predict
            modal = self._router(hs[self.active], lp, eps)  # [B, E, A]
            coefs = (
                jnp.einsum(
                    "bea,az->bez", modal.astype(jnp.float32),
                    lp["altup_pred_coefs"],
                )
                .reshape(B, E, A, A)
                .swapaxes(-1, -2)
            )
            pred = jnp.einsum(
                "abed,beaz->zbed",
                hs.astype(jnp.float32), coefs,
            ).astype(hs.dtype) + hs
            active = pred[self.active]
            act_n = rms_norm(active, lp["input_norm"], eps)

            # ---- laurel
            lr = qmm(
                qmm(act_n, lp["laurel_left"], "bed,dr->ber"),
                lp["laurel_right"], "ber,rd->bed",
            )
            laurel = act_n + rms_norm(lr, lp["laurel_norm"], eps)

            # ---- attention (q-only on shared layers)
            q = qmm(act_n, lp["wq"], "bed,dh->beh").reshape(B, E, H, hd)
            q = rms_norm(q, lp["q_norm"], eps)
            k = qmm(act_n, lp["wk"], "bed,dh->beh").reshape(B, E, Hkv, hd)
            k = rms_norm(k, lp["k_norm"], eps)
            v = qmm(act_n, lp["wv"], "bed,dh->beh").reshape(B, E, Hkv, hd)
            v = _rms_noscale(v, eps)

            def rope_local(q, k):
                return apply_rope(q, k, fb.positions, self.rope_local)

            def rope_global(q, k):
                return apply_rope(q, k, fb.positions, self.rope_global)

            q, k = jax.lax.cond(sliding, rope_local, rope_global, q, k)
            pool = jax.lax.cond(
                wr,
                lambda p: write_kv(p, src, k, v, fb.out_slots),
                lambda p: p,
                pool,
            )

            def attend_sliding(q, pool):
                return paged_attention_xla(
                    q, pool, src, fb.page_tables, fb.seq_lens,
                    fb.positions, page_size, self.scale,
                    sliding_window=self.sliding_window,
                )

            def attend_full(q, pool):
                return paged_attention_xla(
                    q, pool, src, fb.page_tables, fb.seq_lens,
                    fb.positions, page_size, self.scale,
                )

            att = jax.lax.cond(sliding, attend_sliding, attend_full, q, pool)
            att = qmm(att.reshape(B, E, H * hd), lp["wo"], "beh,hd->bed")
            att = rms_norm(att, lp["post_attn_norm"], eps)
            attn_laurel = (active + att + laurel) * jnp.asarray(
                2.0**-0.5, hs.dtype
            )

            # ---- MLP with gaussian-topk activation sparsity
            h2 = rms_norm(attn_laurel, lp["pre_ffw_norm"], eps)
            gate = qmm(h2, lp["w_gate"], "bed,df->bef").astype(jnp.float32)
            mean = jnp.mean(gate, axis=-1, keepdims=True)
            std = jnp.sqrt(
                jnp.mean((gate - mean) ** 2, axis=-1, keepdims=True)
            )
            cutoff = mean + std * s_mult
            gate = jnp.where(s_on, jax.nn.relu(gate - cutoff), gate)
            act = jax.nn.gelu(gate, approximate=True).astype(h2.dtype)
            up = qmm(h2, lp["w_up"], "bed,df->bef")
            ffw = qmm(act * up, lp["w_down"], "bef,fd->bed")
            activated = attn_laurel + rms_norm(ffw, lp["post_ffw_norm"], eps)

            # ---- AltUp correct
            modal2 = self._router(activated, lp, eps)
            ccoefs = (
                jnp.einsum(
                    "bea,az->bez", modal2.astype(jnp.float32),
                    lp["altup_corr_coefs"],
                )
                + 1.0
            )  # [B, E, A]
            innovation = (activated - pred[self.active]).astype(jnp.float32)
            corrected = (
                pred.astype(jnp.float32)
                + innovation[None] * ccoefs.transpose(2, 0, 1)[..., None]
            ).astype(hs.dtype)

            # ---- per-layer input fed to the non-active branches
            first = corrected[self.active]
            if self.correct_scale:
                first = (
                    first.astype(jnp.float32)
                    * lp["altup_out_scale"]
                ).astype(first.dtype)
            g = qmm(first, lp["pli_gate"], "bed,dp->bep")
            g = jax.nn.gelu(g.astype(jnp.float32), approximate=True).astype(
                g.dtype
            )
            g = g * pli
            add = qmm(g, lp["pli_proj"], "bep,pd->bed")
            add = rms_norm(add, lp["pli_norm"], eps)
            corrected = corrected.at[1:].add(add[None].astype(corrected.dtype))
            return (corrected, pool), None

        (hs, pool), _ = jax.lax.scan(
            layer_fn,
            (hs, kv_pool),
            (params["layers"], flags, kv_src, kv_wr, sp_on, sp_mult, pl_xs),
        )

        # unembed: magnitude-matched mean over branches
        outs = [hs[0]]
        for j in range(1, A):
            pj = qmm(hs[j], params[f"altup_unembed_{j}"], "bed,df->bef")
            outs.append(self._magnitude_match(hs[0], pj))
        x = jnp.mean(jnp.stack(outs), axis=0)
        x = rms_norm(x, params["final_norm"], eps)
        return x, pool


ENTRY_CLASS = Gemma3nForCausalLM
