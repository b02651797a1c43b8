"""Qwen2.5-VL: windowed-attention ViT + Qwen2 LM with mrope.

Behavioral counterpart of the reference's `srt/models/qwen2_5_vl.py`
(ViT `Qwen2_5_VisionTransformer:229`, window index `:286`, 2D rot pos
`:339`, merger `:185`) and `srt/layers/attention/vision.py`, re-designed
for TPU:

  * the window shuffle / cu_seqlens bookkeeping is computed host-side in
    numpy (`vit_layout`); the device sees a padded patch array plus two
    segment-id vectors (window / full) — attention masks are segment-id
    equality, built inside the kernel-friendly einsum attention.
  * the 32-block trunk runs as a `lax.scan` with `lax.cond` picking the
    full-attention branch for ``fullatt_block_indexes`` (same pattern as
    gemma3: two branches compile once, any depth).
  * LM trunk = LlamaForCausalLM (qwen2 flavor) with mrope section rope
    and spliced image embeddings (`fb.input_embeds`/`embed_mask`).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.llama import LlamaForCausalLM, rms_norm

NEG_INF = -1e9


# ----------------------------------------------------------------------
# Host-side layout: window shuffle + segment ids (numpy)
# ----------------------------------------------------------------------
def vit_layout(grid_thw: np.ndarray, vision_cfg: Dict[str, Any]):
    """Returns (window_index [P'], window_seg [P], full_seg [P],
    pos_hw [P, 2]) where P = total patches in WINDOW (shuffled) order.

    window_index maps shuffled merge-group order -> original merge-group
    order (reference `get_window_index`); segment ids are per-patch
    attention groups after the shuffle."""
    merge = vision_cfg.get("spatial_merge_size", 2)
    patch = vision_cfg.get("patch_size", 14)
    window = vision_cfg.get("window_size", 112)
    unit = merge * merge
    wsize = window // merge // patch  # merge-groups per window side

    win_index: List[np.ndarray] = []
    win_seqlens: List[int] = []
    pos_rows: List[np.ndarray] = []
    full_seg: List[np.ndarray] = []
    base = 0
    for img_i, (t, h, w) in enumerate(np.asarray(grid_thw)):
        t, h, w = int(t), int(h), int(w)
        gh, gw = h // merge, w // merge
        idx = np.arange(t * gh * gw).reshape(t, gh, gw)
        pad_h = (-gh) % wsize
        pad_w = (-gw) % wsize
        nwh, nww = (gh + pad_h) // wsize, (gw + pad_w) // wsize
        padded = np.pad(idx, ((0, 0), (0, pad_h), (0, pad_w)), constant_values=-100)
        padded = padded.reshape(t, nwh, wsize, nww, wsize).transpose(0, 1, 3, 2, 4)
        padded = padded.reshape(t, nwh * nww, wsize, wsize)
        lens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        flat = flat[flat != -100]
        win_index.append(flat + base)
        win_seqlens.extend(int(x) for x in lens if x > 0)
        base += t * gh * gw

        # per-PATCH 2D rope positions in ORIGINAL merge-group order
        hp = np.arange(h).reshape(gh, merge, 1, 1)
        hp = np.broadcast_to(hp, (gh, merge, gw, merge))
        hp = hp.transpose(0, 2, 1, 3).reshape(-1)
        wp = np.arange(w).reshape(1, 1, gw, merge)
        wp = np.broadcast_to(wp, (gh, merge, gw, merge))
        wp = wp.transpose(0, 2, 1, 3).reshape(-1)
        pr = np.stack([hp, wp], axis=-1)  # [h*w, 2]
        pos_rows.append(np.tile(pr, (t, 1)))
        full_seg.append(np.full(t * h * w, img_i, dtype=np.int32))

    window_index = np.concatenate(win_index)
    pos_hw = np.concatenate(pos_rows, axis=0)  # [P, 2] original patch order
    full_seg_orig = np.concatenate(full_seg)

    # expand merge-group shuffle to patch granularity
    P_ = len(window_index) * unit
    patch_perm = (window_index[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
    pos_hw = pos_hw[patch_perm]
    full_seg_shuf = full_seg_orig[patch_perm]
    win_seg = np.repeat(np.arange(len(win_seqlens)), np.asarray(win_seqlens) * unit)
    assert len(win_seg) == P_
    return patch_perm, win_seg.astype(np.int32), full_seg_shuf, pos_hw.astype(np.int32)


# ----------------------------------------------------------------------
class Qwen2_5_VLForCausalLM(LlamaForCausalLM):
    """LM trunk + vision tower.  The runner calls `vision_forward` once
    per multimodal prefill; the LM consumes spliced embeddings."""

    is_multimodal = True

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        self.vision_cfg = hf.get("vision_config", {})
        vc = self.vision_cfg
        self.v_hidden = vc.get("hidden_size", 1280)
        self.v_depth = vc.get("depth", 32)
        self.v_heads = vc.get("num_heads", 16)
        self.v_head_dim = self.v_hidden // self.v_heads
        self.v_inter = vc.get("intermediate_size", 3420)
        self.v_patch_dim = (
            vc.get("in_channels", 3)
            * vc.get("temporal_patch_size", 2)
            * vc.get("patch_size", 14) ** 2
        )
        self.v_merge = vc.get("spatial_merge_size", 2)
        self.v_out = vc.get("out_hidden_size", config.hidden_size)
        self.v_fullatt = set(vc.get("fullatt_block_indexes", [7, 15, 23, 31]))
        rs = hf.get("rope_scaling") or {}
        self.mrope_section = rs.get("mrope_section")
        self.image_token_id = hf.get("image_token_id")

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        dt = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        Hv, D3, F = self.v_hidden, self.v_head_dim, self.v_inter
        L = self.v_depth
        mh = Hv * self.v_merge * self.v_merge
        shapes["visual"] = {
            "patch_embed": ((self.v_patch_dim, Hv), dt),
            "blocks": {
                "norm1": ((L, Hv), jnp.float32),
                "norm2": ((L, Hv), jnp.float32),
                "wqkv": ((L, Hv, 3 * Hv), dt),
                "bqkv": ((L, 3 * Hv), dt),
                "wproj": ((L, Hv, Hv), dt),
                "bproj": ((L, Hv), dt),
                "w_gate": ((L, Hv, F), dt),
                "b_gate": ((L, F), dt),
                "w_up": ((L, Hv, F), dt),
                "b_up": ((L, F), dt),
                "w_down": ((L, F, Hv), dt),
                "b_down": ((L, Hv), dt),
            },
            "merger_norm": ((Hv,), jnp.float32),
            "merger_fc1": ((mh, mh), dt),
            "merger_b1": ((mh,), dt),
            "merger_fc2": ((mh, self.v_out), dt),
            "merger_b2": ((self.v_out,), dt),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["visual"] = {
            "patch_embed": P(),
            "blocks": {
                "norm1": P(None, None),
                "norm2": P(None, None),
                "wqkv": P(None, None, "model"),
                "bqkv": P(None, "model"),
                "wproj": P(None, "model", None),
                "bproj": P(None, None),
                "w_gate": P(None, None, "model"),
                "b_gate": P(None, "model"),
                "w_up": P(None, None, "model"),
                "b_up": P(None, "model"),
                "w_down": P(None, "model", None),
                "b_down": P(None, None),
            },
            "merger_norm": P(),
            "merger_fc1": P(None, "model"),
            "merger_b1": P("model"),
            "merger_fc2": P("model", None),
            "merger_b2": P(),
        }
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        vis_top = {
            "visual.patch_embed.proj.weight": ("visual.patch_embed", "flatten_oc_transpose"),
            "visual.merger.ln_q.weight": ("visual.merger_norm", None),
            "visual.merger.mlp.0.weight": ("visual.merger_fc1", "transpose"),
            "visual.merger.mlp.0.bias": ("visual.merger_b1", None),
            "visual.merger.mlp.2.weight": ("visual.merger_fc2", "transpose"),
            "visual.merger.mlp.2.bias": ("visual.merger_b2", None),
        }
        # HF checkpoints prefix the tower as "visual." or "model.visual."
        for k, v in list(vis_top.items()):
            vis_top["model." + k] = v
        top.update(vis_top)
        return top, per_layer

    def hf_block_maps(self):
        return {
            "visual.blocks.": {
                "norm1.weight": ("visual.blocks.norm1", None),
                "norm2.weight": ("visual.blocks.norm2", None),
                "attn.qkv.weight": ("visual.blocks.wqkv", "transpose"),
                "attn.qkv.bias": ("visual.blocks.bqkv", None),
                "attn.proj.weight": ("visual.blocks.wproj", "transpose"),
                "attn.proj.bias": ("visual.blocks.bproj", None),
                "mlp.gate_proj.weight": ("visual.blocks.w_gate", "transpose"),
                "mlp.gate_proj.bias": ("visual.blocks.b_gate", None),
                "mlp.up_proj.weight": ("visual.blocks.w_up", "transpose"),
                "mlp.up_proj.bias": ("visual.blocks.b_up", None),
                "mlp.down_proj.weight": ("visual.blocks.w_down", "transpose"),
                "mlp.down_proj.bias": ("visual.blocks.b_down", None),
            }
        }

    # ------------------------------------------------------------------
    def compute_vision_embeds(self, params, mm, vision_fn) -> jax.Array:
        """Host-side layout + padded device call (moved from the runner:
        windowed-ViT shuffle, pow2 patch buckets, merge-group unshuffle)."""
        grid = mm["image_grid_thw"]
        perm, win_seg, full_seg, pos_hw = vit_layout(grid, self.vision_cfg)
        pixels = np.asarray(mm["pixel_values"], dtype=np.float32)[perm]
        P = pixels.shape[0]
        unit = self.v_merge**2
        Pb = max(-(-P // unit) * unit, unit)
        Pb = 1 << (Pb - 1).bit_length()  # pow2 bucket to bound recompiles
        Pb = max(Pb, unit)
        pad = Pb - P
        if pad:
            pixels = np.pad(pixels, ((0, pad), (0, 0)))
            win_seg = np.pad(win_seg, (0, pad), constant_values=-1)
            full_seg = np.pad(full_seg, (0, pad), constant_values=-1)
            pos_hw = np.pad(pos_hw, ((0, pad), (0, 0)))
        flags = np.zeros((self.v_depth,), dtype=bool)
        flags[list(self.v_fullatt)] = True
        out = vision_fn(
            params,
            jnp.asarray(pixels),
            jnp.asarray(win_seg),
            jnp.asarray(full_seg),
            jnp.asarray(pos_hw),
            jnp.asarray(flags),
        )  # [Pb/unit, D] in window merge-group order
        n_groups = P // unit
        reverse = np.argsort(perm[::unit] // unit)
        return out[:n_groups][jnp.asarray(reverse)]

    # ------------------------------------------------------------------
    def vision_forward(
        self,
        params: Dict[str, Any],
        pixels: jax.Array,  # [P, patch_dim] in WINDOW order, padded
        win_seg: jax.Array,  # [P] int32 (-1 = padding)
        full_seg: jax.Array,  # [P] int32 (-1 = padding)
        pos_hw: jax.Array,  # [P, 2] int32
        fullatt_flags: jax.Array,  # [depth] bool
    ) -> jax.Array:
        """ViT trunk + merger; returns [P // merge^2, v_out] embeddings in
        WINDOW merge-group order (caller un-shuffles)."""
        v = params["visual"]
        Hv, nh, hd = self.v_hidden, self.v_heads, self.v_head_dim
        x = pixels.astype(v["patch_embed"].dtype) @ v["patch_embed"]  # [P, Hv]
        Pn = x.shape[0]

        # 2D rotary table: inv freqs over head_dim//4, gathered per (h, w)
        half = hd // 2
        quarter = half // 2
        inv = 1.0 / (
            10000.0 ** (np.arange(0, quarter, dtype=np.float64) / quarter)
        )
        maxg = 4096
        table = np.outer(np.arange(maxg), inv).astype(np.float32)
        table_j = jnp.asarray(table)
        fh = table_j[pos_hw[:, 0]]  # [P, quarter]
        fw = table_j[pos_hw[:, 1]]
        freqs = jnp.concatenate([fh, fw], axis=-1)  # [P, half]
        emb = jnp.concatenate([freqs, freqs], axis=-1)  # [P, hd]
        cos = jnp.cos(emb)[None, :, None, :]
        sin = jnp.sin(emb)[None, :, None, :]

        def rot(t):  # [1, P, nh, hd] rotate-half
            t1, t2 = jnp.split(t, 2, axis=-1)
            return jnp.concatenate([-t2, t1], axis=-1)

        def attend(q, k, vv, seg):
            mask = (seg[None, :, None] == seg[None, None, :]) & (
                seg[None, None, :] >= 0
            )  # [1, P, P]
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            s = jnp.where(mask[:, None], s, NEG_INF)
            p = jax.nn.softmax(s, axis=-1).astype(vv.dtype)
            return jnp.einsum(
                "bhqk,bkhd->bqhd", p, vv, preferred_element_type=jnp.float32
            ).astype(vv.dtype)

        eps = 1e-6

        def block(carry, xs):
            x = carry
            lp, is_full = xs
            h = rms_norm(x, lp["norm1"], eps)
            qkv = h @ lp["wqkv"] + lp["bqkv"]  # [P, 3Hv]
            q, k, vv = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(1, Pn, nh, hd)
            k = k.reshape(1, Pn, nh, hd)
            vv = vv.reshape(1, Pn, nh, hd)
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            q = (qf * cos + rot(qf) * sin).astype(x.dtype)
            k = (kf * cos + rot(kf) * sin).astype(x.dtype)
            att = jax.lax.cond(
                is_full,
                lambda q, k, vv: attend(q, k, vv, full_seg),
                lambda q, k, vv: attend(q, k, vv, win_seg),
                q, k, vv,
            )
            att = att.reshape(Pn, Hv) @ lp["wproj"] + lp["bproj"]
            x = x + att
            h2 = rms_norm(x, lp["norm2"], eps)
            act = jax.nn.silu((h2 @ lp["w_gate"] + lp["b_gate"]).astype(jnp.float32))
            act = act.astype(x.dtype) * (h2 @ lp["w_up"] + lp["b_up"])
            x = x + (act @ lp["w_down"] + lp["b_down"])
            return x, None

        x, _ = jax.lax.scan(block, x, (v["blocks"], fullatt_flags))

        # merger: concat merge^2 patches -> MLP
        x = rms_norm(x, v["merger_norm"], eps)
        unit = self.v_merge * self.v_merge
        x = x.reshape(Pn // unit, unit * Hv)
        x = jax.nn.gelu(
            (x @ v["merger_fc1"] + v["merger_b1"]).astype(jnp.float32),
            approximate=False,
        ).astype(x.dtype)
        return x @ v["merger_fc2"] + v["merger_b2"]  # [P/unit, v_out]
