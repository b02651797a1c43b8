"""Qwen2-VL: full-attention ViT + Qwen2 LM with mrope.

Behavioral counterpart of the reference's `srt/models/qwen2_vl.py`
(`Qwen2VisionTransformer`, per-frame cu_seqlens attention, 2D rot pos,
`Qwen2VisionPatchMerger`).  Shares the Qwen2.5-VL LM trunk / mrope /
embed-splice machinery; the tower differs:

  * every block is FULL attention over one (image, frame) segment — no
    window shuffle, patches stay in the processor's merge-group order.
  * LayerNorm (w + b) blocks and merger ln_q, quick-gelu fc1/fc2 MLP
    (vs RMSNorm + SiLU gate/up in 2.5).
  * tower width is `embed_dim` (mlp = embed_dim * mlp_ratio); the
    vision config's `hidden_size` is the LM-facing output dim.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.bert import layer_norm
from sglang_npu_tpu.models.qwen2_5_vl import NEG_INF, Qwen2_5_VLForCausalLM


def _frame_layout(grid_thw: np.ndarray, merge: int):
    """(frame_seg [P], pos_hw [P, 2]) in the processor's merge-group patch
    order; one attention segment per (image, temporal frame)."""
    segs: List[np.ndarray] = []
    pos: List[np.ndarray] = []
    seg = 0
    for t, h, w in np.asarray(grid_thw):
        t, h, w = int(t), int(h), int(w)
        gh, gw = h // merge, w // merge
        hp = np.arange(h).reshape(gh, merge, 1, 1)
        hp = np.broadcast_to(hp, (gh, merge, gw, merge))
        hp = hp.transpose(0, 2, 1, 3).reshape(-1)
        wp = np.arange(w).reshape(1, 1, gw, merge)
        wp = np.broadcast_to(wp, (gh, merge, gw, merge))
        wp = wp.transpose(0, 2, 1, 3).reshape(-1)
        pr = np.stack([hp, wp], axis=-1)  # [h*w, 2]
        pos.append(np.tile(pr, (t, 1)))
        segs.append(np.repeat(np.arange(seg, seg + t), h * w))
        seg += t
    return (
        np.concatenate(segs).astype(np.int32),
        np.concatenate(pos, axis=0).astype(np.int32),
    )


class Qwen2VLForCausalLM(Qwen2_5_VLForCausalLM):
    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        vc = self.vision_cfg
        self.v_hidden = vc.get("embed_dim", 1280)
        self.v_heads = vc.get("num_heads", 16)
        self.v_head_dim = self.v_hidden // self.v_heads
        self.v_inter = int(self.v_hidden * vc.get("mlp_ratio", 4))
        # vision_config.hidden_size IS the LM hidden size in qwen2-vl
        self.v_out = vc.get("hidden_size", config.hidden_size)

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        dt = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        Hv, F, L = self.v_hidden, self.v_inter, self.v_depth
        mh = Hv * self.v_merge * self.v_merge
        shapes["visual"] = {
            "patch_embed": ((self.v_patch_dim, Hv), dt),
            "blocks": {
                "norm1": ((L, Hv), jnp.float32),
                "norm1_b": ((L, Hv), jnp.float32),
                "norm2": ((L, Hv), jnp.float32),
                "norm2_b": ((L, Hv), jnp.float32),
                "wqkv": ((L, Hv, 3 * Hv), dt),
                "bqkv": ((L, 3 * Hv), dt),
                "wproj": ((L, Hv, Hv), dt),
                "bproj": ((L, Hv), dt),
                "w_fc1": ((L, Hv, F), dt),
                "b_fc1": ((L, F), dt),
                "w_fc2": ((L, F, Hv), dt),
                "b_fc2": ((L, Hv), dt),
            },
            "merger_norm": ((Hv,), jnp.float32),
            "merger_norm_b": ((Hv,), jnp.float32),
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
                "norm1_b": P(None, None),
                "norm2": P(None, None),
                "norm2_b": P(None, None),
                "wqkv": P(None, None, "model"),
                "bqkv": P(None, "model"),
                "wproj": P(None, "model", None),
                "bproj": P(None, None),
                "w_fc1": P(None, None, "model"),
                "b_fc1": P(None, "model"),
                "w_fc2": P(None, "model", None),
                "b_fc2": P(None, None),
            },
            "merger_norm": P(),
            "merger_norm_b": P(),
            "merger_fc1": P(None, "model"),
            "merger_b1": P("model"),
            "merger_fc2": P("model", None),
            "merger_b2": P(),
        }
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        # drop the 2.5 tower keys that point at absent params
        top = {k: v for k, v in top.items() if not v[0].startswith("visual.")}
        vis_top = {
            "visual.patch_embed.proj.weight": ("visual.patch_embed", "flatten_oc_transpose"),
            "visual.merger.ln_q.weight": ("visual.merger_norm", None),
            "visual.merger.ln_q.bias": ("visual.merger_norm_b", None),
            "visual.merger.mlp.0.weight": ("visual.merger_fc1", "transpose"),
            "visual.merger.mlp.0.bias": ("visual.merger_b1", None),
            "visual.merger.mlp.2.weight": ("visual.merger_fc2", "transpose"),
            "visual.merger.mlp.2.bias": ("visual.merger_b2", None),
        }
        for k, v in list(vis_top.items()):
            vis_top["model." + k] = v
        top.update(vis_top)
        return top, per_layer

    def hf_block_maps(self):
        return {
            "visual.blocks.": {
                "norm1.weight": ("visual.blocks.norm1", None),
                "norm1.bias": ("visual.blocks.norm1_b", None),
                "norm2.weight": ("visual.blocks.norm2", None),
                "norm2.bias": ("visual.blocks.norm2_b", None),
                "attn.qkv.weight": ("visual.blocks.wqkv", "transpose"),
                "attn.qkv.bias": ("visual.blocks.bqkv", None),
                "attn.proj.weight": ("visual.blocks.wproj", "transpose"),
                "attn.proj.bias": ("visual.blocks.bproj", None),
                "mlp.fc1.weight": ("visual.blocks.w_fc1", "transpose"),
                "mlp.fc1.bias": ("visual.blocks.b_fc1", None),
                "mlp.fc2.weight": ("visual.blocks.w_fc2", "transpose"),
                "mlp.fc2.bias": ("visual.blocks.b_fc2", None),
            }
        }

    # ------------------------------------------------------------------
    def compute_vision_embeds(self, params, mm, vision_fn) -> jax.Array:
        grid = mm["image_grid_thw"]
        seg, pos_hw = _frame_layout(grid, self.v_merge)
        pixels = np.asarray(mm["pixel_values"], dtype=np.float32)
        Pn = pixels.shape[0]
        unit = self.v_merge**2
        Pb = max(-(-Pn // unit) * unit, unit)
        Pb = 1 << (Pb - 1).bit_length()
        Pb = max(Pb, unit)
        pad = Pb - Pn
        if pad:
            pixels = np.pad(pixels, ((0, pad), (0, 0)))
            seg = np.pad(seg, (0, pad), constant_values=-1)
            pos_hw = np.pad(pos_hw, ((0, pad), (0, 0)))
        out = vision_fn(
            params, jnp.asarray(pixels), jnp.asarray(seg), jnp.asarray(pos_hw)
        )
        return out[: Pn // unit]

    def vision_forward(
        self,
        params: Dict[str, Any],
        pixels: jax.Array,  # [P, patch_dim] padded
        seg: jax.Array,  # [P] int32 frame segment ids (-1 = padding)
        pos_hw: jax.Array,  # [P, 2]
    ) -> jax.Array:
        v = params["visual"]
        Hv, nh, hd = self.v_hidden, self.v_heads, self.v_head_dim
        x = pixels.astype(v["patch_embed"].dtype) @ v["patch_embed"]
        Pn = x.shape[0]

        half = hd // 2
        quarter = half // 2
        inv = 1.0 / (
            10000.0 ** (np.arange(0, quarter, dtype=np.float64) / quarter)
        )
        table_j = jnp.asarray(
            np.outer(np.arange(4096), inv).astype(np.float32)
        )
        freqs = jnp.concatenate(
            [table_j[pos_hw[:, 0]], table_j[pos_hw[:, 1]]], axis=-1
        )
        emb = jnp.concatenate([freqs, freqs], axis=-1)  # [P, hd]
        cos = jnp.cos(emb)[:, None, :]
        sin = jnp.sin(emb)[:, None, :]

        def rot(t):
            t1, t2 = jnp.split(t, 2, axis=-1)
            return jnp.concatenate([-t2, t1], axis=-1)

        mask = (seg[None, :] == seg[:, None]) & (seg[None, :] >= 0)  # [P, P]
        eps = 1e-6

        def quick_gelu(t):
            return t * jax.nn.sigmoid(1.702 * t)

        def block(x, lp):
            h = layer_norm(x, lp["norm1"], lp["norm1_b"], eps)
            qkv = h @ lp["wqkv"] + lp["bqkv"]
            q, k, vv = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(Pn, nh, hd).astype(jnp.float32)
            k = k.reshape(Pn, nh, hd).astype(jnp.float32)
            vv = vv.reshape(Pn, nh, hd)
            q = (q * cos + rot(q) * sin).astype(x.dtype)
            k = (k * cos + rot(k) * sin).astype(x.dtype)
            s = jnp.einsum(
                "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            s = jnp.where(mask[None], s, NEG_INF)
            p = jax.nn.softmax(s, axis=-1).astype(vv.dtype)
            att = jnp.einsum(
                "hqk,khd->qhd", p, vv, preferred_element_type=jnp.float32
            ).astype(vv.dtype)
            att = att.reshape(Pn, Hv) @ lp["wproj"] + lp["bproj"]
            x = x + att
            h2 = layer_norm(x, lp["norm2"], lp["norm2_b"], eps)
            act = quick_gelu(
                (h2 @ lp["w_fc1"] + lp["b_fc1"]).astype(jnp.float32)
            ).astype(x.dtype)
            x = x + (act @ lp["w_fc2"] + lp["b_fc2"])
            return x, None

        x, _ = jax.lax.scan(block, x, v["blocks"])
        x = layer_norm(x, v["merger_norm"], v["merger_norm_b"], eps)
        unit = self.v_merge * self.v_merge
        x = x.reshape(Pn // unit, unit * Hv)
        x = jax.nn.gelu(
            (x @ v["merger_fc1"] + v["merger_b1"]).astype(jnp.float32),
            approximate=False,
        ).astype(x.dtype)
        return x @ v["merger_fc2"] + v["merger_b2"]


ENTRY_CLASS = Qwen2VLForCausalLM
