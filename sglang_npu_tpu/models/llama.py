"""Llama-family decoder (functional JAX, scan-over-layers).

TPU-native re-design of the reference's `srt/models/llama.py` /
`qwen2.py` / `qwen3.py` (nn.Module per layer, forward(input_ids, positions,
forward_batch)): here the model is a pure function over a pytree of
*stacked* per-layer weights, iterated with `jax.lax.scan` so XLA traces one
layer once (fast compiles, clean KV-pool aliasing), and sharded for tensor
parallelism purely via NamedSharding PartitionSpecs on the weight pytree.

Covers (via config flags): Llama 2/3/3.x, Mistral, Qwen2 (qkv bias),
Qwen3 (q/k norm, untied head_dim).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import (
    apply_rope,
    apply_rope_cs,
    make_rope_tables,
    rms_norm,
    silu_and_mul,
)
from sglang_npu_tpu.layers.quantization import matmul as qmm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.ops.xla_attention import paged_attention_xla, write_kv


class LlamaForCausalLM:
    """Functional Llama. Weights live in a pytree; this object holds config
    and the attention backend callable."""

    # pipeline parallelism (set by ModelRunner): stages shard the stacked
    # layer dim over the mesh 'pipe' axis; forward runs the GPipe
    # microbatch schedule in _pp_backbone_forward
    pp_size = 1
    pp_mesh = None
    # Granite-class scalar multipliers (1.0 = plain llama; statically
    # folded away when unused)
    embedding_multiplier = 1.0
    residual_multiplier = 1.0
    logits_scaling = 1.0
    # residual-stream norm flavor (gemma-1 swaps in the (1 + w) variant);
    # applies to input/post/final norms in backbone_forward — q/k head
    # norms stay plain rms_norm
    norm_fn = staticmethod(rms_norm)
    # rope application hook: partial-rotary models (exaone-v1 class)
    # override with models.phi.rope_partial over their rot_dims
    def rope_apply(self, q, k, rope_cs):
        return apply_rope_cs(q, k, *rope_cs)
    # load-time fused projections (reference QKVParallelLinear /
    # MergedColumnParallelLinear, `srt/layers/linear.py`): merged at tp=1
    # by ModelRunner.merge_projections — fewer, wider matmul dispatches
    # (the W4/FP8 decode paths pay a fixed cost per kernel call)
    merge_groups = (
        ("w_qkv", ("wq", "wk", "wv")),
        ("w_gateup", ("w_gate", "w_up")),
    )

    def __init__(self, config: ModelConfig, attn_backend=None):
        self.config = config
        self.attn_backend = attn_backend  # set by ModelRunner
        c = config
        self.q_size = c.num_attention_heads * c.head_dim
        self.kv_size = c.num_key_value_heads * c.head_dim
        self.scale = c.head_dim**-0.5
        self.rope = make_rope_tables(
            c.head_dim,
            max(c.context_length, c.max_position_embeddings),
            c.rope_theta,
            c.rope_scaling,
        )

    # ------------------------------------------------------------------
    # Parameter structure
    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, D, F = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        shapes = {
            "embed": ((c.vocab_size, D), dt),
            "final_norm": ((D,), jnp.float32),
            "layers": {
                "input_norm": ((L, D), jnp.float32),
                "post_norm": ((L, D), jnp.float32),
                "wq": ((L, D, self.q_size), dt),
                "wk": ((L, D, self.kv_size), dt),
                "wv": ((L, D, self.kv_size), dt),
                "wo": ((L, self.q_size, D), dt),
                "w_gate": ((L, D, F), dt),
                "w_up": ((L, D, F), dt),
                "w_down": ((L, F, D), dt),
            },
        }
        if c.attention_bias:
            shapes["layers"]["bq"] = ((L, self.q_size), dt)
            shapes["layers"]["bk"] = ((L, self.kv_size), dt)
            shapes["layers"]["bv"] = ((L, self.kv_size), dt)
        if c.qk_norm:
            shapes["layers"]["q_norm"] = ((L, c.head_dim), jnp.float32)
            shapes["layers"]["k_norm"] = ((L, c.head_dim), jnp.float32)
        if not c.tie_word_embeddings:
            shapes["lm_head"] = ((D, c.vocab_size), dt)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        """PartitionSpecs: column-parallel q/k/v/gate/up, row-parallel
        o/down — the TP layout of the reference's linear layers
        (`srt/layers/linear.py`) expressed as sharding annotations."""
        c = self.config
        specs = {
            "embed": P(None, "model"),
            "final_norm": P(None),
            "layers": {
                "input_norm": P(None, None),
                "post_norm": P(None, None),
                "wq": P(None, None, "model"),
                "wk": P(None, None, "model"),
                "wv": P(None, None, "model"),
                "wo": P(None, "model", None),
                "w_gate": P(None, None, "model"),
                "w_up": P(None, None, "model"),
                "w_down": P(None, "model", None),
            },
        }
        if c.attention_bias:
            specs["layers"]["bq"] = P(None, "model")
            specs["layers"]["bk"] = P(None, "model")
            specs["layers"]["bv"] = P(None, "model")
        if c.qk_norm:
            specs["layers"]["q_norm"] = P(None, None)
            specs["layers"]["k_norm"] = P(None, None)
        if not c.tie_word_embeddings:
            specs["lm_head"] = P(None, "model")
        return specs

    # HF checkpoint name -> (our key path, transform)
    # transform: how the HF tensor maps into the stacked layer array.
    def hf_weight_map(self):
        c = self.config
        m = {
            "model.embed_tokens.weight": ("embed", None),
            "model.norm.weight": ("final_norm", None),
        }
        if not c.tie_word_embeddings:
            m["lm_head.weight"] = ("lm_head", "transpose")
        per_layer = {
            "input_layernorm.weight": ("layers.input_norm", None),
            "post_attention_layernorm.weight": ("layers.post_norm", None),
            "self_attn.q_proj.weight": ("layers.wq", "transpose"),
            "self_attn.k_proj.weight": ("layers.wk", "transpose"),
            "self_attn.v_proj.weight": ("layers.wv", "transpose"),
            "self_attn.o_proj.weight": ("layers.wo", "transpose"),
            "mlp.gate_proj.weight": ("layers.w_gate", "transpose"),
            "mlp.up_proj.weight": ("layers.w_up", "transpose"),
            "mlp.down_proj.weight": ("layers.w_down", "transpose"),
        }
        if c.attention_bias:
            per_layer["self_attn.q_proj.bias"] = ("layers.bq", None)
            per_layer["self_attn.k_proj.bias"] = ("layers.bk", None)
            per_layer["self_attn.v_proj.bias"] = ("layers.bv", None)
        if c.qk_norm:
            per_layer["self_attn.q_norm.weight"] = ("layers.q_norm", None)
            per_layer["self_attn.k_norm.weight"] = ("layers.k_norm", None)
        return m, per_layer

    # ------------------------------------------------------------------
    # Forward
    # ------------------------------------------------------------------
    def __call__(
        self,
        params: Dict[str, Any],
        kv_pool: jax.Array,  # [L, 2, S, H_kv, D]
        fb: ForwardBatch,
        page_size: int,
        collect_moe: bool = False,
        moe_mask=None,  # [B] bool: count this row's tokens in the stats
    ):
        """Returns (logits [B, vocab], new_kv_pool); with ``collect_moe``
        (MoE models only) additionally per-expert routing counts
        [n_moe_layers, E] for the EPLB recorder."""
        if collect_moe:
            last, new_kv, moe_stats = self.hidden_forward(
                params, kv_pool, fb, page_size,
                collect_moe=True, moe_mask=moe_mask,
            )
        else:
            last, new_kv = self.hidden_forward(params, kv_pool, fb, page_size)
        logits = self.logits_from_hidden(params, last)
        if collect_moe:
            return logits, new_kv, moe_stats
        return logits, new_kv

    def logits_from_hidden(self, params, last):
        """lm-head tail shared by __call__ and debug_forward."""
        # bf16 x bf16 matmul with f32 accumulation — never materialize an
        # f32 copy of the vocab matrix.
        if "lm_head" not in params:
            logits = jnp.einsum(
                "bd,vd->bv",
                last,
                params["embed"],
                preferred_element_type=jnp.float32,
            )
        else:
            logits = jnp.einsum(
                "bd,dv->bv",
                last,
                params["lm_head"],
                preferred_element_type=jnp.float32,
            )
        if "lm_head_b" in params:  # phi-style biased head
            logits = logits + params["lm_head_b"]
        if self.logits_scaling != 1.0:
            logits = logits / self.logits_scaling
        return logits

    def debug_forward(self, params, kv_pool, fb: ForwardBatch, page_size: int):
        """Tensor-dump forward (reference `debug_utils/dumper.py`): the
        normal extend forward PLUS the post-layer residual stream of every
        layer.  Returns (logits [B, V], new_kv, aux [L, B, E, D])."""
        L = self.config.num_hidden_layers
        x, new_kv, aux = self.backbone_forward(
            params, kv_pool, fb, page_size, aux_after=tuple(range(L))
        )
        if fb.extend_seq_lens is not None:
            idx = jnp.maximum(fb.extend_seq_lens - 1, 0)
            last = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
        else:
            last = x[:, 0]
        return self.logits_from_hidden(params, last), new_kv, aux

    def _rope_cos_sin(self, fb: ForwardBatch):
        """Per-token rope cos/sin [..., D/2].  Standard models gather at
        the sequential positions; mrope models (qwen2.5-vl) gather each
        head-dim section at its own (t, h, w) position row and add a
        per-request delta during decode (HF `get_rope_index` deltas)."""
        rope = self.rope
        section = getattr(self, "mrope_section", None)
        if section and fb.mrope_positions is not None:
            cs, ss, off = [], [], 0
            for i, sec in enumerate(section):
                p = fb.mrope_positions[..., i]
                cs.append(rope["cos"][p][..., off : off + sec])
                ss.append(rope["sin"][p][..., off : off + sec])
                off += sec
            return jnp.concatenate(cs, -1), jnp.concatenate(ss, -1)
        pos = fb.positions
        if section and fb.mrope_delta is not None:
            pos = pos + fb.mrope_delta[:, None]
        return rope["cos"][pos], rope["sin"][pos]

    def hidden_forward(
        self,
        params: Dict[str, Any],
        kv_pool: jax.Array,
        fb: ForwardBatch,
        page_size: int,
        collect_moe: bool = False,
        moe_mask=None,
    ):
        """Trunk forward; returns (last-token hidden [B, D], new_kv_pool)."""
        if collect_moe:
            x, new_kv, moe_stats = self.backbone_forward(
                params, kv_pool, fb, page_size,
                collect_moe=True, moe_mask=moe_mask,
            )
        else:
            x, new_kv = self.backbone_forward(params, kv_pool, fb, page_size)
        if fb.extend_seq_lens is not None:
            idx = jnp.maximum(fb.extend_seq_lens - 1, 0)  # [B]
            last = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
        else:
            last = x[:, 0]
        if collect_moe:
            return last, new_kv, moe_stats
        return last, new_kv

    def backbone_forward(
        self,
        params: Dict[str, Any],
        kv_pool: jax.Array,
        fb: ForwardBatch,
        page_size: int,
        collect_moe: bool = False,
        moe_mask=None,
        aux_after=None,
    ):
        """Full trunk: returns (hidden [B, E, D], new_kv_pool); with
        ``collect_moe`` (MoE models) additionally the per-layer routed
        token counts [L, E] as scan ys (EPLB recorder feed).  ``moe_mask``
        [B] excludes padded batch rows from the counts.  ``aux_after``
        (static tuple of layer indices) additionally returns the EAGLE3
        aux hidden states [A, B, E, D] — the residual stream captured
        after each listed layer, pre-final-norm (reference
        `srt/models/llama.py:329` aux_hidden_states)."""
        if self.pp_size > 1:
            assert not collect_moe, "EPLB stats not supported under PP"
            return self._pp_backbone_forward(params, kv_pool, fb, page_size)
        c = self.config
        B, E = fb.input_ids.shape
        x = params["embed"][fb.input_ids].astype(
            jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        )  # [B, E, D]
        if self.embedding_multiplier != 1.0:
            x = x * jnp.asarray(self.embedding_multiplier, x.dtype)
        if fb.input_embeds is not None:
            # multimodal: image-token rows replaced by vision embeddings
            x = jnp.where(
                fb.embed_mask[..., None], fb.input_embeds.astype(x.dtype), x
            )

        eps = c.rms_norm_eps
        rope = self.rope
        rope_cs = self._rope_cos_sin(fb)
        # stats mask per flattened [B*E] token row (MoE layers flatten
        # [B, E, D] -> [B*E, D] with row t = b*E + e)
        smask = (
            jnp.repeat(moe_mask, E)
            if collect_moe and moe_mask is not None
            else None
        )

        # The KV pool is CARRIED whole through the layer scan and addressed
        # with combined (layer, k/v, slot) gather/scatter indices — XLA then
        # touches only the accessed rows in place.  (Consuming the pool as
        # scan xs/ys instead would copy a full per-layer slab every
        # iteration: traffic proportional to pool size, not batch size.)
        use_lora = fb.lora_ids is not None and "lora_scaling" in params
        if use_lora:
            from sglang_npu_tpu.lora.lora_manager import apply_lora

            lora_scaling = params["lora_scaling"]
            lora_ids = fb.lora_ids

        # Stacked Pallas-path quant weights (W4 / int8) stay OUT of the
        # scan xs: consuming them as xs materializes a full per-layer
        # weight copy at every pallas-call boundary (measured 2.6x the
        # matmul cost at batch 256 — scripts/r5_probe_decode.py scanmm).
        # The kernels instead receive the whole [L, ...] stack and address
        # the layer via a scalar-prefetched index map, exactly like the KV
        # pool (same "carry it, address with combined indices" rule).
        from sglang_npu_tpu.layers.quantization import (
            QuantizedWeight,
            QuantizedWeightW4,
        )

        stacked_quant = {
            k: v
            for k, v in params["layers"].items()
            if isinstance(v, (QuantizedWeight, QuantizedWeightW4))
            and v.q.ndim == 3
        }
        xs_layers = {
            k: v for k, v in params["layers"].items()
            if k not in stacked_quant
        }

        def _proj(h, lp, wkey, eq):
            lay = lp.get("__layer__") if wkey in stacked_quant else None
            out = qmm(h, lp[wkey], eq, layer=lay)
            if use_lora and f"lora_{wkey}_a" in lp:
                out = apply_lora(h, out, lp, wkey, lora_ids, lora_scaling)
            return out

        def layer_fn(carry, lp):
            x, kv_pool, l = carry
            lp = {**lp, **stacked_quant, "__layer__": l}
            h = self.norm_fn(x, lp["input_norm"], eps)
            q, k, v = self._qkv_proj(h, lp, _proj)
            if "bq" in lp:
                q = q + lp["bq"]
                k = k + lp["bk"]
                v = v + lp["bv"]
            if "q_norm_full" in lp:
                # olmoe-style RMS norm over the FULL projected q/k width
                q = rms_norm(q, lp["q_norm_full"], eps)
                k = rms_norm(k, lp["k_norm_full"], eps)
            q = q.reshape(B, E, c.num_attention_heads, c.head_dim)
            k = k.reshape(B, E, c.num_key_value_heads, c.head_dim)
            v = v.reshape(B, E, c.num_key_value_heads, c.head_dim)
            if "q_norm" in lp:
                q = rms_norm(q, lp["q_norm"], eps)
                k = rms_norm(k, lp["k_norm"], eps)
            q, k = self.rope_apply(q, k, rope_cs)
            if "q_norm_post" in lp:
                # hunyuan-style per-head qk RMS norm AFTER rope
                q = rms_norm(q, lp["q_norm_post"], eps)
                k = rms_norm(k, lp["k_norm_post"], eps)

            att, kv_pool = self._attention(q, k, v, kv_pool, l, fb, page_size)
            rm = self.residual_multiplier
            att_out = _proj(
                att.reshape(B, E, self.q_size), lp, "wo", "beh,hd->bed"
            )
            x = x + (att_out if rm == 1.0 else att_out * jnp.asarray(rm, x.dtype))

            h = self.norm_fn(x, lp["post_norm"], eps)
            if collect_moe:
                delta, stats = self._mlp(
                    h, lp, _proj, collect_stats=True, stats_mask=smask
                )
                x = x + (delta if rm == 1.0 else delta * jnp.asarray(rm, x.dtype))
                return (x, kv_pool, l + 1), stats
            delta = self._mlp(h, lp, _proj)
            x = x + (delta if rm == 1.0 else delta * jnp.asarray(rm, x.dtype))
            return (x, kv_pool, l + 1), None

        if aux_after is not None:
            assert not collect_moe
            aux_ids = jnp.asarray(aux_after, jnp.int32)

            def layer_fn_aux(carry, lp):
                inner, aux = carry
                (x, kvp, l2), _ = layer_fn(inner, lp)
                hit = (aux_ids == (l2 - 1))[:, None, None, None]
                aux = jnp.where(hit, x[None], aux)
                return ((x, kvp, l2), aux), None

            aux0 = jnp.zeros((len(aux_after),) + x.shape, x.dtype)
            ((x, new_kv, _), aux), _ = jax.lax.scan(
                layer_fn_aux, ((x, kv_pool, jnp.int32(0)), aux0),
                xs_layers,
            )
            x = self.norm_fn(x, params["final_norm"], eps)
            return x, new_kv, aux

        (x, new_kv, _), ys = jax.lax.scan(
            layer_fn, (x, kv_pool, jnp.int32(0)), xs_layers
        )
        x = self.norm_fn(x, params["final_norm"], eps)
        if collect_moe:
            return x, new_kv, ys  # ys: [L, E] routed-token counts
        return x, new_kv

    def _pp_backbone_forward(self, params, kv_pool, fb: ForwardBatch, page_size: int):
        """Pipeline-parallel trunk (reference PP worker loop,
        `srt/managers/scheduler.py` pp_rank plumbing + 1F1B micro-batching
        in `tp_worker`): TPU-natively, the stacked layer dim IS the stage
        dim — weights [L, ...] and the KV pool [L, ...] shard over the mesh
        'pipe' axis in L/S slabs, and ONE program runs the GPipe schedule:
        the batch splits into M = S microbatches; each tick every stage
        runs its layer slab on its current microbatch and `ppermute`s the
        hidden to the next stage.  The 'model' axis stays GSPMD-auto inside
        (same partial-manual trick as dp_attention.py), so PP composes with
        TP.  Microbatch t finishes after S ticks; total T = M + S - 1."""
        c = self.config
        S = self.pp_size
        mesh = self.pp_mesh
        B, E = fb.input_ids.shape
        M = S  # microbatches
        assert B % M == 0, f"batch bucket {B} not divisible by pp={M}"
        mb = B // M
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        eps = c.rms_norm_eps

        x_all = params["embed"][fb.input_ids].astype(dt)  # [B, E, D]
        cos, sin = self._rope_cos_sin(fb)

        def split(a):  # [B, ...] -> [M, mb, ...]
            return a.reshape((M, mb) + a.shape[1:])

        xs, cs, ss = split(x_all), split(cos), split(sin)
        pts, sls = split(fb.page_tables), split(fb.seq_lens)
        poss, oss = split(fb.positions), split(fb.out_slots)
        use_lora = fb.lora_ids is not None and "lora_scaling" in params
        lids = split(fb.lora_ids) if use_lora else jnp.zeros((M, mb), jnp.int32)
        lora_scaling = params.get(
            "lora_scaling", jnp.zeros((1,), jnp.float32)
        )

        def local(layers, pool, xs, cs, ss, pts, sls, poss, oss, lids, lsc):
            s = jax.lax.axis_index("pipe")
            T = M + S - 1

            def run_slab(h, midx, pool, active):
                fb_mb = ForwardBatch(
                    input_ids=None,
                    positions=poss[midx],
                    # inactive ticks write to slot 0 (the garbage page)...
                    out_slots=jnp.where(active, oss[midx], 0),
                    page_tables=pts[midx],
                    # ...and are invisible to the fused Pallas write (its
                    # in-place insert targets seq_len-1 of the REAL page
                    # table, so inactive ticks must see an empty sequence)
                    seq_lens=jnp.where(active, sls[midx], 0),
                    extend_seq_lens=None,
                    extend_prefix_lens=None,
                )
                rope_cs = (cs[midx], ss[midx])
                if use_lora:
                    from sglang_npu_tpu.lora.lora_manager import apply_lora

                    lora_ids_mb = lids[midx]

                    def proj(x_, lp_, wkey, eq):
                        out = qmm(x_, lp_[wkey], eq)
                        if f"lora_{wkey}_a" in lp_:
                            out = apply_lora(
                                x_, out, lp_, wkey, lora_ids_mb, lsc
                            )
                        return out
                else:
                    proj = None

                def layer_fn(carry, lp):
                    x, pool, l = carry
                    h = rms_norm(x, lp["input_norm"], eps)
                    q, k, v = self._qkv_proj(h, lp, proj)
                    if "bq" in lp:
                        q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
                    q = q.reshape(mb, E, c.num_attention_heads, c.head_dim)
                    k = k.reshape(mb, E, c.num_key_value_heads, c.head_dim)
                    v = v.reshape(mb, E, c.num_key_value_heads, c.head_dim)
                    if "q_norm" in lp:
                        q = rms_norm(q, lp["q_norm"], eps)
                        k = rms_norm(k, lp["k_norm"], eps)
                    q, k = self.rope_apply(q, k, rope_cs)
                    att, pool = self._attention(
                        q, k, v, pool, l, fb_mb, page_size
                    )
                    wo_in = att.reshape(mb, E, self.q_size)
                    if proj is not None:
                        x = x + proj(wo_in, lp, "wo", "beh,hd->bed")
                    else:
                        x = x + qmm(wo_in, lp["wo"], "beh,hd->bed")
                    h2 = rms_norm(x, lp["post_norm"], eps)
                    x = x + self._mlp(h2, lp, proj)
                    return (x, pool, l + 1), None

                (h, pool, _), _ = jax.lax.scan(
                    layer_fn, (h, pool, jnp.int32(0)), layers
                )
                return h, pool

            def tick(carry, t):
                pool, h_prev, out = carry
                mb_idx = t - s  # microbatch this stage handles this tick
                active = (mb_idx >= 0) & (mb_idx < M)
                midx = jnp.clip(mb_idx, 0, M - 1)
                h_in = jnp.where(s == 0, xs[midx], h_prev)
                h_out, pool = run_slab(h_in, midx, pool, active)
                done = active & (s == S - 1)
                out = out.at[midx].set(
                    jnp.where(done, h_out, out[midx])
                )
                h_next = jax.lax.ppermute(
                    h_out, "pipe", [(i, i + 1) for i in range(S - 1)]
                )
                return (pool, h_next, out), None

            out0 = jnp.zeros((M, mb, E, x_all.shape[-1]), x_all.dtype)
            (pool, _, out), _ = jax.lax.scan(
                tick,
                (pool, jnp.zeros_like(xs[0]), out0),
                jnp.arange(M + S - 1),
            )
            # only the last stage holds real outputs; replicate via psum
            out = jnp.where(s == S - 1, out, 0)
            out = jax.lax.psum(out, "pipe")
            return out.reshape(B, E, -1), pool

        pipe0 = P("pipe")
        pool_specs = jax.tree_util.tree_map(lambda _: pipe0, kv_pool)
        layer_specs = jax.tree_util.tree_map(
            lambda _: pipe0, params["layers"]
        )
        x, new_kv = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                layer_specs, pool_specs,
                P(), P(), P(), P(), P(), P(), P(), P(), P(),
            ),
            out_specs=(P(), pool_specs),
            axis_names={"pipe"},
            check_vma=False,
        )(
            params["layers"], kv_pool, xs, cs, ss, pts, sls, poss, oss,
            lids, lora_scaling,
        )
        x = rms_norm(x, params["final_norm"], eps)
        return x, new_kv

    def verify_forward(
        self,
        params: Dict[str, Any],
        kv_pool: jax.Array,
        fb: ForwardBatch,
        page_size: int,
        tree_mask: jax.Array,  # [T, T] bool ancestor-or-self
        aux_after=None,
    ):
        """Speculative tree-verify trunk (reference TARGET_VERIFY): the
        fed tokens attend the committed pool prefix plus in-flight
        ancestors; the pool is NOT written.  Returns
        (hidden [B, T, D], (k_stack, v_stack) [L, B, T, Hkv, Dh]) — the
        per-layer fed K/V so the scheduler can commit accepted rows.
        With ``aux_after``, additionally the EAGLE3 aux hiddens
        [A, B, T, D] (pre-final-norm residual stream)."""
        from sglang_npu_tpu.ops.xla_attention import tree_verify_attention_xla

        c = self.config
        B, T = fb.input_ids.shape
        x = params["embed"][fb.input_ids].astype(
            jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        )
        eps = c.rms_norm_eps
        rope = self.rope

        def layer_fn(carry, lp):
            x, l = carry
            h = rms_norm(x, lp["input_norm"], eps)
            q, k, v = self._qkv_proj(h, lp)
            if "bq" in lp:
                q = q + lp["bq"]
                k = k + lp["bk"]
                v = v + lp["bv"]
            q = q.reshape(B, T, c.num_attention_heads, c.head_dim)
            k = k.reshape(B, T, c.num_key_value_heads, c.head_dim)
            v = v.reshape(B, T, c.num_key_value_heads, c.head_dim)
            if "q_norm" in lp:
                q = rms_norm(q, lp["q_norm"], eps)
                k = rms_norm(k, lp["k_norm"], eps)
            q, k = apply_rope(q, k, fb.positions, rope)
            att = tree_verify_attention_xla(
                q, k, v, kv_pool, l, fb.page_tables,
                fb.extend_prefix_lens, tree_mask, page_size, self.scale,
            )
            x = x + qmm(
                att.reshape(B, T, self.q_size), lp["wo"], "beh,hd->bed"
            )
            h2 = rms_norm(x, lp["post_norm"], eps)
            x = x + self._mlp(h2, lp)
            return (x, l + 1), (k, v)

        if aux_after is not None:
            aux_ids = jnp.asarray(aux_after, jnp.int32)

            def layer_fn_aux(carry, lp):
                inner, aux = carry
                (x, l2), kv = layer_fn(inner, lp)
                hit = (aux_ids == (l2 - 1))[:, None, None, None]
                aux = jnp.where(hit, x[None], aux)
                return ((x, l2), aux), kv

            aux0 = jnp.zeros((len(aux_after),) + x.shape, x.dtype)
            ((x, _), aux), (k_stack, v_stack) = jax.lax.scan(
                layer_fn_aux, ((x, jnp.int32(0)), aux0), params["layers"]
            )
            x = rms_norm(x, params["final_norm"], eps)
            return x, (k_stack, v_stack), aux

        (x, _), (k_stack, v_stack) = jax.lax.scan(
            layer_fn, (x, jnp.int32(0)), params["layers"]
        )
        x = rms_norm(x, params["final_norm"], eps)
        return x, (k_stack, v_stack)

    def token_logprobs_forward(
        self, params, kv_pool, fb: ForwardBatch, page_size: int, targets
    ):
        """log p(targets[b, e] | tokens up to position e) for each extend
        position; targets[b, e] is the NEXT token after position e.
        Returns ([B, E] f32, new_kv_pool)."""
        x, new_kv = self.backbone_forward(params, kv_pool, fb, page_size)
        head = params["embed"] if "lm_head" not in params else params["lm_head"].T
        logits = jnp.einsum(
            "bed,vd->bev", x, head, preferred_element_type=jnp.float32
        )
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        out = jnp.take_along_axis(logprobs, targets[:, :, None], axis=-1)[:, :, 0]
        return out, new_kv

    def embed_forward(self, params, kv_pool, fb: ForwardBatch, page_size: int):
        """Pooled-embedding forward (reference `llama_embedding.py` +
        `layers/pooler.py`): trunk hidden states, last-token pooling,
        L2 normalization."""
        last_hidden, kv_pool = self.hidden_forward(params, kv_pool, fb, page_size)
        normed = last_hidden.astype(jnp.float32) / jnp.linalg.norm(
            last_hidden.astype(jnp.float32), axis=-1, keepdims=True
        ).clip(1e-9)
        return normed, kv_pool

    def _qkv_proj(self, h, lp, proj=None):
        """q/k/v projections, transparently using the load-time-fused
        ``w_qkv`` when present (ModelRunner.merge_projections; tp=1 only
        so the static output splits never cross shard boundaries)."""
        if proj is None:
            proj = lambda x, lp_, k, eq: qmm(x, lp_[k], eq)
        if "w_qkv" in lp:
            qkv = proj(h, lp, "w_qkv", "bed,dh->beh")
            q = qkv[..., : self.q_size]
            k = qkv[..., self.q_size : self.q_size + self.kv_size]
            v = qkv[..., self.q_size + self.kv_size :]
            return q, k, v
        q = proj(h, lp, "wq", "bed,dh->beh")
        k = proj(h, lp, "wk", "bed,dh->beh")
        v = proj(h, lp, "wv", "bed,dh->beh")
        return q, k, v

    def _mlp(self, h, lp, proj=None, collect_stats=False, stats_mask=None):
        """Dense SwiGLU MLP; overridden by MoE models."""
        assert not collect_stats, "collect_moe requires a MoE model"
        if proj is None:
            proj = lambda x, lp_, k, eq: qmm(x, lp_[k], eq)
        if "w_gateup" in lp:
            gu = proj(h, lp, "w_gateup", "bed,df->bef")
            F = gu.shape[-1] // 2
            gate, up = gu[..., :F], gu[..., F:]
        else:
            gate = proj(h, lp, "w_gate", "bed,df->bef")
            up = proj(h, lp, "w_up", "bed,df->bef")
        act = jax.nn.silu(gate) * up  # stays shard-local under TP
        return proj(act, lp, "w_down", "bef,fd->bed")

    def _attention(self, q, k, v, kv_pool, layer_idx, fb: ForwardBatch, page_size: int):
        """Write new K/V into the pool and attend; returns (out, pool).
        The write happens inside the backend so Pallas backends can fuse it
        in-place (XLA scatter would force pool relayout copies)."""
        if self.attn_backend is not None:
            return self.attn_backend(
                q, k, v, kv_pool, layer_idx, fb, page_size, self.scale, self.config
            )
        kv_pool = write_kv(kv_pool, layer_idx, k, v, fb.out_slots)
        out = paged_attention_xla(
            q,
            kv_pool,
            layer_idx,
            fb.page_tables,
            fb.seq_lens,
            fb.positions,
            page_size,
            self.scale,
            sliding_window=self.config.sliding_window or -1,
        )
        return out, kv_pool


# silu/swiglu note: gate/up are separate arrays so TP sharding of the fused
# activation stays local (see param_shardings); the concat+split pair here
# fuses away in XLA.
ENTRY_CLASS = LlamaForCausalLM
