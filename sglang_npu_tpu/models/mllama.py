"""Mllama (Llama-3.2-Vision): tiled ViT + llama trunk with interleaved
cross-attention layers.

Behavioral counterpart of the reference's `srt/models/mllama.py:1`
(MllamaVisionModel tiles/gated embeddings/global layers, cross-attention
decoder layers with tanh gates, cross-attention mask semantics) —
re-designed for this engine:

  * the language trunk runs a Python per-layer loop (heterogeneous
    layers: self-attention layers use the paged KV pool; cross-attention
    layers read per-REQUEST cached vision K/V);
  * vision K/V live in a dedicated slot buffer (`MllamaKVPool.ck/cv`)
    carried inside the kv-pool pytree: computed ONCE per request at its
    first prefill chunk (the fixed image never changes), reused by every
    later chunk/decode step — the TPU analogue of the reference's
    cross-attention KV cache;
  * requests map to buffer slots via the scheduler's mm-slot free list
    (fb.mm_slots; slot 0 is the all-zeros "no image" slot: zero K makes
    the cross-attn branch an exact identity for text-only rows, matching
    the reference skipping the layer);
  * the cross-attention mask reproduces HF exactly, including the
    full-row quirk (tokens BEFORE the first image attend uniformly over
    the request's vision tokens while their MLP delta is zeroed).

Parity: tests/test_mllama.py (HF greedy, image + text-only + mixed).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import apply_rope, make_rope_tables, rms_norm
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch
from sglang_npu_tpu.models.llama import LlamaForCausalLM
from sglang_npu_tpu.ops.xla_attention import paged_attention_xla, write_kv

NEG_INF = -1e30


def _lk(i: int) -> str:
    return f"layer_{i:03d}"


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MllamaKVPool:
    """Paged self-attn pool + per-request cross-attn vision K/V slots."""

    paged: Any  # [L, 2, Hkv, NP, ps, D] (self-attn layers only use theirs)
    ck: jax.Array  # [Lc, SLOTS, S_vis, Hkv, D]
    cv: jax.Array  # [Lc, SLOTS, S_vis, Hkv, D]


def layer_norm(x, w, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (out * w + b).astype(x.dtype)


class MllamaForCausalLM(LlamaForCausalLM):
    is_multimodal = True
    mm_cross_attention = True  # scheduler: allocate mm slots
    requires_xla_attention = True  # scatter into ck/cv forbids pallas pools
    merge_groups = ()  # heterogeneous per-layer params; no stacked fusion
    mm_slots_max = 8  # concurrent image requests (cross KV is large)

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        vc = hf.get("vision_config", {})
        self.vision_cfg = vc
        self.cross_layers = set(hf.get("cross_attention_layers", []))
        self.image_token_id = hf.get("image_token_index")
        # vision dims
        self.v_dim = vc.get("hidden_size", 1280)
        self.v_heads = vc.get("attention_heads", 16)
        self.v_head_dim = self.v_dim // self.v_heads
        self.v_inter = vc.get("intermediate_size", 5120)
        self.v_layers = vc.get("num_hidden_layers", 32)
        self.v_global_layers = vc.get("num_global_layers", 8)
        self.v_patch = vc.get("patch_size", 14)
        self.v_img = vc.get("image_size", 448)
        self.v_max_tiles = vc.get("max_num_tiles", 4)
        self.v_num_ar = len(vc.get("supported_aspect_ratios", [[1, 1]])) + 1
        self.v_int_idx = tuple(
            vc.get("intermediate_layers_indices", [3, 7, 15, 23, 30])
        )
        self.v_out_dim = vc.get(
            "vision_output_dim", self.v_dim * (len(self.v_int_idx) + 1)
        )
        self.patches_per_tile = (self.v_img // self.v_patch) ** 2 + 1
        # per-tile token count after the +8 pad trimming = patches_per_tile
        self.s_vis_max = self.v_max_tiles * self.patches_per_tile

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        D, F = c.hidden_size, c.intermediate_size
        hd = c.head_dim
        qs, kvs = self.q_size, self.kv_size
        shapes: Dict[str, Any] = {
            # HF mllama allocates vocab_size + 8 embedding rows (the
            # image/special tokens live past vocab_size)
            "embed": ((c.vocab_size + 8, D), dt),
            "final_norm": ((D,), jnp.float32),
        }
        if not c.tie_word_embeddings:
            shapes["lm_head"] = ((D, c.vocab_size), dt)
        for i in range(c.num_hidden_layers):
            if i in self.cross_layers:
                lp = {
                    "input_norm": ((D,), jnp.float32),
                    "post_norm": ((D,), jnp.float32),
                    "xq": ((D, qs), dt),
                    "xk": ((D, kvs), dt),
                    "xv": ((D, kvs), dt),
                    "xo": ((qs, D), dt),
                    "q_norm": ((hd,), jnp.float32),
                    "k_norm": ((hd,), jnp.float32),
                    "gate_attn": ((1,), jnp.float32),
                    "gate_ffwd": ((1,), jnp.float32),
                    "w_gate": ((D, F), dt),
                    "w_up": ((D, F), dt),
                    "w_down": ((F, D), dt),
                }
            else:
                lp = {
                    "input_norm": ((D,), jnp.float32),
                    "post_norm": ((D,), jnp.float32),
                    "wq": ((D, qs), dt),
                    "wk": ((D, kvs), dt),
                    "wv": ((D, kvs), dt),
                    "wo": ((qs, D), dt),
                    "w_gate": ((D, F), dt),
                    "w_up": ((D, F), dt),
                    "w_down": ((F, D), dt),
                }
            shapes[_lk(i)] = lp
        # vision tower
        Dv, Fv, hdv = self.v_dim, self.v_inter, self.v_head_dim
        pt = self.patches_per_tile - 1  # patches sans class token
        block = {
            "ln1_w": ((Dv,), jnp.float32),
            "ln1_b": ((Dv,), jnp.float32),
            "ln2_w": ((Dv,), jnp.float32),
            "ln2_b": ((Dv,), jnp.float32),
            "wq": ((Dv, Dv), dt),
            "wk": ((Dv, Dv), dt),
            "wv": ((Dv, Dv), dt),
            "wo": ((Dv, Dv), dt),
            "fc1": ((Dv, Fv), dt),
            "fc1_b": ((Fv,), jnp.float32),
            "fc2": ((Fv, Dv), dt),
            "fc2_b": ((Dv,), jnp.float32),
        }
        gblock = dict(block)
        gblock["gate_attn"] = ((1,), jnp.float32)
        gblock["gate_ffn"] = ((1,), jnp.float32)
        shapes["visual"] = {
            "patch_embed": ((3 * self.v_patch**2, Dv), dt),
            "class_emb": ((Dv,), jnp.float32),
            "pos_emb": ((pt + 1, Dv), jnp.float32),
            "pos_gate": ((1,), jnp.float32),
            "tile_pos_emb": (
                (self.v_num_ar, self.v_max_tiles * (pt + 1) * Dv), dt,
            ),
            "pre_tile_emb": ((self.v_num_ar, self.v_max_tiles * Dv), dt),
            "pre_tile_gate": ((1,), jnp.float32),
            "post_tile_emb": ((self.v_num_ar, self.v_max_tiles * Dv), dt),
            "post_tile_gate": ((1,), jnp.float32),
            "ln_pre_w": ((Dv,), jnp.float32),
            "ln_pre_b": ((Dv,), jnp.float32),
            "ln_post_w": ((Dv,), jnp.float32),
            "ln_post_b": ((Dv,), jnp.float32),
            "blocks": {
                k: ((self.v_layers,) + s, d) for k, (s, d) in block.items()
            },
            "gblocks": {
                k: ((self.v_global_layers,) + s, d)
                for k, (s, d) in gblock.items()
            },
            "proj": ((self.v_out_dim, self.config.hidden_size), dt),
            "proj_b": ((self.config.hidden_size,), jnp.float32),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        def repl(node):
            if isinstance(node, dict):
                return {k: repl(v) for k, v in node.items()}
            return P()

        return repl(self.param_shapes())

    def hf_weight_map(self):
        c = self.config
        # checkpoint names: model.language_model.* (the loader rewrites
        # that prefix to model.*), model.vision_model.*, lm_head.weight
        m: Dict[str, tuple] = {
            "model.embed_tokens.weight": ("embed", None),
            "model.norm.weight": ("final_norm", None),
            "lm_head.weight": ("lm_head", "transpose"),
        }
        for i in range(c.num_hidden_layers):
            pre = f"model.layers.{i}."
            k = _lk(i)
            m[pre + "input_layernorm.weight"] = (f"{k}.input_norm", None)
            m[pre + "post_attention_layernorm.weight"] = (f"{k}.post_norm", None)
            m[pre + "mlp.gate_proj.weight"] = (f"{k}.w_gate", "transpose")
            m[pre + "mlp.up_proj.weight"] = (f"{k}.w_up", "transpose")
            m[pre + "mlp.down_proj.weight"] = (f"{k}.w_down", "transpose")
            if i in self.cross_layers:
                m[pre + "cross_attn.q_proj.weight"] = (f"{k}.xq", "transpose")
                m[pre + "cross_attn.k_proj.weight"] = (f"{k}.xk", "transpose")
                m[pre + "cross_attn.v_proj.weight"] = (f"{k}.xv", "transpose")
                m[pre + "cross_attn.o_proj.weight"] = (f"{k}.xo", "transpose")
                m[pre + "cross_attn.q_norm.weight"] = (f"{k}.q_norm", None)
                m[pre + "cross_attn.k_norm.weight"] = (f"{k}.k_norm", None)
                m[pre + "cross_attn_attn_gate"] = (f"{k}.gate_attn", None)
                m[pre + "cross_attn_mlp_gate"] = (f"{k}.gate_ffwd", None)
            else:
                m[pre + "self_attn.q_proj.weight"] = (f"{k}.wq", "transpose")
                m[pre + "self_attn.k_proj.weight"] = (f"{k}.wk", "transpose")
                m[pre + "self_attn.v_proj.weight"] = (f"{k}.wv", "transpose")
                m[pre + "self_attn.o_proj.weight"] = (f"{k}.wo", "transpose")
        v = "model.vision_model."
        m.update({
            v + "patch_embedding.weight": (
                "visual.patch_embed", "flatten_oc_transpose",
            ),
            v + "class_embedding": ("visual.class_emb", None),
            v + "gated_positional_embedding.embedding": ("visual.pos_emb", None),
            v + "gated_positional_embedding.gate": ("visual.pos_gate", None),
            v + "gated_positional_embedding.tile_embedding.weight": (
                "visual.tile_pos_emb", None,
            ),
            v + "pre_tile_positional_embedding.embedding.weight": (
                "visual.pre_tile_emb", None,
            ),
            v + "pre_tile_positional_embedding.gate": (
                "visual.pre_tile_gate", None,
            ),
            v + "post_tile_positional_embedding.embedding.weight": (
                "visual.post_tile_emb", None,
            ),
            v + "post_tile_positional_embedding.gate": (
                "visual.post_tile_gate", None,
            ),
            v + "layernorm_pre.weight": ("visual.ln_pre_w", None),
            v + "layernorm_pre.bias": ("visual.ln_pre_b", None),
            v + "layernorm_post.weight": ("visual.ln_post_w", None),
            v + "layernorm_post.bias": ("visual.ln_post_b", None),
            "model.multi_modal_projector.weight": ("visual.proj", "transpose"),
            "model.multi_modal_projector.bias": ("visual.proj_b", None),
        })
        return m, {}

    def hf_block_maps(self):
        blk = {
            "input_layernorm.weight": ("visual.blocks.ln1_w", None),
            "input_layernorm.bias": ("visual.blocks.ln1_b", None),
            "post_attention_layernorm.weight": ("visual.blocks.ln2_w", None),
            "post_attention_layernorm.bias": ("visual.blocks.ln2_b", None),
            "self_attn.q_proj.weight": ("visual.blocks.wq", "transpose"),
            "self_attn.k_proj.weight": ("visual.blocks.wk", "transpose"),
            "self_attn.v_proj.weight": ("visual.blocks.wv", "transpose"),
            "self_attn.o_proj.weight": ("visual.blocks.wo", "transpose"),
            "mlp.fc1.weight": ("visual.blocks.fc1", "transpose"),
            "mlp.fc1.bias": ("visual.blocks.fc1_b", None),
            "mlp.fc2.weight": ("visual.blocks.fc2", "transpose"),
            "mlp.fc2.bias": ("visual.blocks.fc2_b", None),
        }
        gblk = {
            k: (v[0].replace("visual.blocks", "visual.gblocks"), v[1])
            for k, v in blk.items()
        }
        gblk["gate_attn"] = ("visual.gblocks.gate_attn", None)
        gblk["gate_ffn"] = ("visual.gblocks.gate_ffn", None)
        maps = {
            "vision_model.transformer.layers.": blk,
            "vision_model.global_transformer.layers.": gblk,
        }
        return maps

    # ------------------------------------------------------------------
    # Vision tower (host-orchestrated; reference MllamaVisionModel)
    # ------------------------------------------------------------------
    def vision_tower(self, params, pixels, aspect_ids, aspect_mask):
        """pixels [M, tiles, C, H, W] f32 (M = media), aspect_ids [M],
        aspect_mask [M, tiles].  Returns cross states [M*tiles*pp, D_txt]
        (projector applied), matching HF's unpadded layout."""
        v = params["visual"]
        Dv = self.v_dim
        M, T = pixels.shape[0], pixels.shape[1]
        p = self.v_patch
        gh = pixels.shape[3] // p
        gw = pixels.shape[4] // p
        npatch = gh * gw
        # unfold conv-as-matmul: [M, T, C, gh, p, gw, p] -> rows (c, i, j)
        x = pixels.reshape(M, T, 3, gh, p, gw, p)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6).reshape(M * T, npatch, 3 * p * p)
        x = jnp.asarray(x, v["patch_embed"].dtype) @ v["patch_embed"]

        # pre-tile positional embedding (gated)
        x = x.reshape(M, T, npatch, Dv)
        pre = v["pre_tile_emb"][aspect_ids].reshape(
            M, self.v_max_tiles, 1, Dv
        )[:, :T]
        x = x + (pre * jnp.tanh(v["pre_tile_gate"])).astype(x.dtype)
        # class token (prepended)
        x = x.reshape(M * T, npatch, Dv)
        cls = jnp.broadcast_to(
            v["class_emb"].astype(x.dtype)[None, None, :], (M * T, 1, Dv)
        )
        x = jnp.concatenate([cls, x], axis=1)
        pp = npatch + 1
        # gated positional embedding
        x = x.reshape(M, T, pp, Dv)
        gate = jnp.tanh(v["pos_gate"])
        x = x + ((1.0 - gate) * v["pos_emb"]).astype(x.dtype)[None, None]
        tile_pos = v["tile_pos_emb"][aspect_ids].reshape(
            M, self.v_max_tiles, pp, Dv
        )[:, :T]
        x = x + (gate * tile_pos).astype(x.dtype)
        x = layer_norm(x, v["ln_pre_w"], v["ln_pre_b"])

        # pad patches to a multiple of 8 (HF) and build the tile mask
        pad = (8 - pp % 8) % 8
        ppad = pp + pad
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # HF mask: inv = 1 - tile_mask (pad patches forced inv=1);
        # additive = inv_q * inv_k * MIN
        inv = 1.0 - jnp.broadcast_to(
            aspect_mask[:, :, None].astype(jnp.float32), (M, T, ppad)
        )
        if pad:
            inv = inv.at[:, :, -pad:].set(1.0)
        inv = inv.reshape(M, T * ppad)
        add_mask = (inv[:, :, None] * inv[:, None, :]) * NEG_INF  # [M, S, S]

        x = x.reshape(M, T * ppad, Dv)
        nh, hdv = self.v_heads, self.v_head_dim

        def run_block(x, lp, gated):
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"])
            q = (h @ lp["wq"]).reshape(M, -1, nh, hdv)
            k = (h @ lp["wk"]).reshape(M, -1, nh, hdv)
            vv = (h @ lp["wv"]).reshape(M, -1, nh, hdv)
            s = jnp.einsum(
                "mqhd,mkhd->mhqk", q, k, preferred_element_type=jnp.float32
            ) * (hdv**-0.5)
            s = s + add_mask[:, None]
            pr = jax.nn.softmax(s, axis=-1).astype(vv.dtype)
            att = jnp.einsum(
                "mhqk,mkhd->mqhd", pr, vv, preferred_element_type=jnp.float32
            ).astype(x.dtype)
            att = att.reshape(M, -1, Dv) @ lp["wo"]
            if gated:
                att = att * jnp.tanh(lp["gate_attn"])
            x = x + att
            h2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
            mlp = jax.nn.gelu(
                (h2 @ lp["fc1"] + lp["fc1_b"]).astype(jnp.float32),
                approximate=False,
            ).astype(x.dtype) @ lp["fc2"] + lp["fc2_b"].astype(x.dtype)
            if gated:
                mlp = mlp * jnp.tanh(lp["gate_ffn"])
            return x + mlp.astype(x.dtype)

        intermediates = []
        for i in range(self.v_layers):
            if i in self.v_int_idx:
                intermediates.append(x)
            lp = jax.tree_util.tree_map(lambda a: a[i], params["visual"]["blocks"])
            x = run_block(x, lp, gated=False)
        if self.v_layers in self.v_int_idx:
            intermediates.append(x)

        x = layer_norm(x, v["ln_post_w"], v["ln_post_b"])
        # post-tile embedding (gated) + global transformer
        x = x.reshape(M, T, ppad, Dv)
        post = v["post_tile_emb"][aspect_ids].reshape(
            M, self.v_max_tiles, 1, Dv
        )[:, :T]
        x = x + (post * jnp.tanh(v["post_tile_gate"])).astype(x.dtype)
        x = x.reshape(M, T * ppad, Dv)
        for i in range(self.v_global_layers):
            lp = jax.tree_util.tree_map(
                lambda a: a[i], params["visual"]["gblocks"]
            )
            x = run_block(x, lp, gated=True)

        # drop patch padding, concat intermediates (collected pre-padding
        # drop) along features
        def unpad(t):
            return t.reshape(M, T, ppad, Dv)[:, :, :pp]

        x = unpad(x)
        inter = jnp.concatenate(
            [unpad(t) for t in intermediates], axis=-1
        )  # [M, T, pp, Dv*n_int]
        full = jnp.concatenate([x, inter], axis=-1)  # [M, T, pp, v_out_dim]
        flat = full.reshape(M * T * pp, -1)
        return (
            flat.astype(params["visual"]["proj"].dtype)
            @ params["visual"]["proj"]
            + params["visual"]["proj_b"]
        ).astype(jnp.float32)

    # ------------------------------------------------------------------
    def prepare_cross(self, params, pool: MllamaKVPool, mm, slot: int):
        """Run the tower + cross K/V projections for one request; scatter
        into the slot buffers.  Returns the updated pool and the request's
        (vis_len_allowed, vis_total)."""
        pixels = jnp.asarray(mm["pixel_values"], jnp.float32)
        if pixels.ndim == 6:  # [1, media, tiles, C, H, W]
            pixels = pixels[0]
        aspect_ids = jnp.asarray(mm["aspect_ratio_ids"]).reshape(-1)
        aspect_mask = np.asarray(mm["aspect_ratio_mask"]).reshape(
            pixels.shape[0], -1
        )
        states = self.vision_tower(
            params, pixels, aspect_ids, jnp.asarray(aspect_mask)
        )  # [media*tiles*pp, D]
        S = states.shape[0]
        c = self.config
        hd = c.head_dim
        Hkv = c.num_key_value_heads
        eps = c.rms_norm_eps
        ck_rows, cv_rows = [], []
        for i in sorted(self.cross_layers):
            lp = params[_lk(i)]
            k = (states.astype(lp["xk"].dtype) @ lp["xk"]).reshape(S, Hkv, hd)
            k = rms_norm(k, lp["k_norm"], eps)
            v = (states.astype(lp["xv"].dtype) @ lp["xv"]).reshape(S, Hkv, hd)
            ck_rows.append(k)
            cv_rows.append(v)
        ck_new = jnp.stack(ck_rows)  # [Lc, S, Hkv, hd]
        cv_new = jnp.stack(cv_rows)
        Sbuf = pool.ck.shape[2]
        padn = Sbuf - S
        if padn > 0:
            ck_new = jnp.pad(ck_new, ((0, 0), (0, padn), (0, 0), (0, 0)))
            cv_new = jnp.pad(cv_new, ((0, 0), (0, padn), (0, 0), (0, 0)))
        ck = pool.ck.at[:, slot].set(ck_new.astype(pool.ck.dtype))
        cv = pool.cv.at[:, slot].set(cv_new.astype(pool.cv.dtype))
        return MllamaKVPool(paged=pool.paged, ck=ck, cv=cv)

    # ------------------------------------------------------------------
    def backbone_forward(
        self, params, kv_pool: MllamaKVPool, fb: ForwardBatch, page_size,
        collect_moe=False, moe_mask=None, aux_after=None,
    ):
        assert not collect_moe and aux_after is None
        c = self.config
        B, E = fb.input_ids.shape
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        x = params["embed"][fb.input_ids].astype(dt)
        eps = c.rms_norm_eps
        H, Hkv, hd = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        paged = kv_pool.paged

        slots = (
            fb.mm_slots
            if fb.mm_slots is not None
            else jnp.zeros((B,), jnp.int32)
        )
        first_pos = (
            fb.mm_first_pos
            if fb.mm_first_pos is not None
            else jnp.full((B,), 1 << 30, jnp.int32)
        )
        vis_len = (
            fb.mm_vis_len if fb.mm_vis_len is not None else jnp.zeros((B,), jnp.int32)
        )
        vis_total = (
            fb.mm_vis_total
            if fb.mm_vis_total is not None
            else jnp.zeros((B,), jnp.int32)
        )
        Sbuf = kv_pool.ck.shape[2]
        s_iota = jnp.arange(Sbuf, dtype=jnp.int32)[None, None, :]
        # per-token row gate: does this token see the image at all?
        row_ok = fb.positions >= first_pos[:, None]  # [B, E]
        in_alloc = s_iota < vis_len[:, None, None]  # [B, 1, S]
        in_total = s_iota < vis_total[:, None, None]
        # HF additive mask incl. the full-row quirk: allowed -> 0; rows
        # with no access (before the image) -> 0 WITHIN the request's
        # vision range (uniform attention quirk); outside the range -> MIN
        add = jnp.where(
            in_total,
            jnp.where(
                row_ok[:, :, None],
                jnp.where(in_alloc, 0.0, NEG_INF),
                0.0,
            ),
            NEG_INF,
        )  # [B, E, S]
        scale = hd**-0.5
        ci = 0
        cross_ids = sorted(self.cross_layers)

        for i in range(c.num_hidden_layers):
            lp = params[_lk(i)]
            if i in self.cross_layers:
                h = rms_norm(x, lp["input_norm"], eps)
                q = (h @ lp["xq"]).reshape(B, E, H, hd)
                q = rms_norm(q, lp["q_norm"], eps)
                li = cross_ids.index(i)
                ck = kv_pool.ck[li, slots]  # [B, S, Hkv, hd]
                cv = kv_pool.cv[li, slots]
                G = H // Hkv
                qg = q.reshape(B, E, Hkv, G, hd)
                s = jnp.einsum(
                    "behgd,bshd->behgs", qg, ck.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                ) * scale
                s = s + add[:, :, None, None, :]
                pr = jax.nn.softmax(s, axis=-1)
                att = jnp.einsum(
                    "behgs,bshd->behgd", pr, cv.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
                att = att.reshape(B, E, self.q_size) @ lp["xo"]
                x = x + jnp.tanh(lp["gate_attn"]).astype(x.dtype) * att
                h2 = rms_norm(x, lp["post_norm"], eps)
                g = jax.nn.silu((h2 @ lp["w_gate"]).astype(jnp.float32))
                mlp = (g.astype(x.dtype) * (h2 @ lp["w_up"])) @ lp["w_down"]
                mlp = mlp * row_ok[:, :, None].astype(x.dtype)
                x = x + jnp.tanh(lp["gate_ffwd"]).astype(x.dtype) * mlp
            else:
                h = rms_norm(x, lp["input_norm"], eps)
                q = (h @ lp["wq"]).reshape(B, E, H, hd)
                k = (h @ lp["wk"]).reshape(B, E, Hkv, hd)
                v = (h @ lp["wv"]).reshape(B, E, Hkv, hd)
                q, k = apply_rope(q, k, fb.positions, self.rope)
                paged = write_kv(paged, jnp.int32(i), k, v, fb.out_slots)
                att = paged_attention_xla(
                    q, paged, jnp.int32(i), fb.page_tables, fb.seq_lens,
                    fb.positions, page_size, self.scale,
                )
                x = x + att.reshape(B, E, self.q_size) @ lp["wo"]
                h2 = rms_norm(x, lp["post_norm"], eps)
                g = jax.nn.silu((h2 @ lp["w_gate"]).astype(jnp.float32))
                x = x + (g.astype(x.dtype) * (h2 @ lp["w_up"])) @ lp["w_down"]
            ci += 1

        x = rms_norm(x, params["final_norm"], eps)
        return x, MllamaKVPool(paged=paged, ck=kv_pool.ck, cv=kv_pool.cv)


ENTRY_CLASS = MllamaForCausalLM
