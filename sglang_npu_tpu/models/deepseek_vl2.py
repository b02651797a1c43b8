"""DeepSeek-VL2: SigLIP-so400m tower + tile layout over the DeepSeek LM.

Counterpart of the reference's `srt/models/deepseek_vl2.py:1` +
`srt/configs/deepseekvl2.py` (behavioral spec — the HF checkpoint is
remote-code):

  * vision: timm-class `vit_so400m_patch14_siglip` — conv patch embed
    (bias), learned pos embed, pre-LN blocks with FUSED qkv (bias), exact
    GELU MLP, final LN (`forward_features`, no pooling head);
  * projector `downsample_mlp_gelu`: 2x2 channel-major unfold ->
    Linear -> GELU -> Linear (`deepseek_vl2.py:129-150`);
  * tile layout (`get_image_feature`, `deepseek_vl2.py:260-355`): global
    384-view + best-resolution local tiles; per grid row an
    `image_newline` embedding, one `view_seperator` between views
    (global first — `global_view_pos == "head"`);
  * language model: DeepSeek-V2 MLA trunk (or dense) under the
    `language.` checkpoint prefix.

The processor half (tiling, normalization, token-count expansion) lives
in `multimodal/processor.py:process_deepseek_vl2`."""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM


def _ln(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class DeepseekVL2ForCausalLM(DeepseekV2ForCausalLM):
    is_multimodal = True

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        vc = hf.get("vision_config", {}) or {}
        pc = hf.get("projector_config", {}) or {}
        self.v_hidden = vc.get("width", vc.get("hidden_size", 1152))
        self.v_layers = vc.get("layers", vc.get("num_hidden_layers", 27))
        self.v_heads = vc.get("heads", vc.get("num_attention_heads", 16))
        self.v_head_dim = self.v_hidden // self.v_heads
        self.v_inter = vc.get(
            "intermediate_size", int(self.v_hidden * vc.get("mlp_ratio", 3.7362))
        )
        self.v_patch = vc.get("patch_size", 14)
        self.v_img = vc.get("image_size", 384)
        self.v_grid = math.ceil(self.v_img / self.v_patch)
        self.v_eps = vc.get("layer_norm_eps", 1e-6)
        self.down = int(pc.get("downsample_ratio", 2))
        self.p_in = pc.get("input_dim", self.v_hidden)
        self.p_embed = pc.get("n_embed", config.hidden_size)
        self.p_ratio = pc.get("mlp_ratio", 1)
        self.tok_side = math.ceil(self.v_grid / self.down)
        self.image_token_id = hf.get("image_token_id")

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        dt = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        Hv, F, L = self.v_hidden, self.v_inter, self.v_layers
        Dt = self.p_embed
        shapes["visual"] = {
            "patch_embed": ((3 * self.v_patch**2, Hv), dt),
            "patch_bias": ((Hv,), dt),
            "pos_embed": ((self.v_grid**2, Hv), dt),
            "blocks": {
                "ln1_w": ((L, Hv), jnp.float32),
                "ln1_b": ((L, Hv), jnp.float32),
                "wqkv": ((L, Hv, 3 * Hv), dt),
                "bqkv": ((L, 3 * Hv), dt),
                "wo": ((L, Hv, Hv), dt),
                "bo": ((L, Hv), dt),
                "ln2_w": ((L, Hv), jnp.float32),
                "ln2_b": ((L, Hv), jnp.float32),
                "fc1": ((L, Hv, F), dt),
                "b1": ((L, F), dt),
                "fc2": ((L, F, Hv), dt),
                "b2": ((L, Hv), dt),
            },
            "post_ln_w": ((Hv,), jnp.float32),
            "post_ln_b": ((Hv,), jnp.float32),
            "proj1_w": ((self.p_in * self.down**2, Dt * self.p_ratio), dt),
            "proj1_b": ((Dt * self.p_ratio,), dt),
            "proj2_w": ((Dt * self.p_ratio, Dt), dt),
            "proj2_b": ((Dt,), dt),
            "image_newline": ((Dt,), dt),
            "view_seperator": ((Dt,), dt),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["visual"] = jax.tree.map(
            lambda _: P(), self.param_shapes()["visual"],
            is_leaf=lambda x: isinstance(x, tuple) and len(x) == 2
            and isinstance(x[0], tuple),
        )
        return specs

    def hf_weight_map(self):
        lm_top, _ = super().hf_weight_map()
        top = {"language." + k: v for k, v in lm_top.items()}
        pre = "vision."
        top.update({
            pre + "patch_embed.proj.weight": (
                "visual.patch_embed", "flatten_oc_transpose",
            ),
            pre + "patch_embed.proj.bias": ("visual.patch_bias", None),
            pre + "pos_embed": ("visual.pos_embed", "reshape"),
            pre + "norm.weight": ("visual.post_ln_w", None),
            pre + "norm.bias": ("visual.post_ln_b", None),
            "projector.layers.0.weight": ("visual.proj1_w", "transpose"),
            "projector.layers.0.bias": ("visual.proj1_b", None),
            "projector.layers.2.weight": ("visual.proj2_w", "transpose"),
            "projector.layers.2.bias": ("visual.proj2_b", None),
            "image_newline": ("visual.image_newline", None),
            "view_seperator": ("visual.view_seperator", None),
        })
        return top, {}

    def hf_block_maps(self):
        m = {
            "norm1.weight": ("visual.blocks.ln1_w", None),
            "norm1.bias": ("visual.blocks.ln1_b", None),
            "attn.qkv.weight": ("visual.blocks.wqkv", "transpose"),
            "attn.qkv.bias": ("visual.blocks.bqkv", None),
            "attn.proj.weight": ("visual.blocks.wo", "transpose"),
            "attn.proj.bias": ("visual.blocks.bo", None),
            "norm2.weight": ("visual.blocks.ln2_w", None),
            "norm2.bias": ("visual.blocks.ln2_b", None),
            "mlp.fc1.weight": ("visual.blocks.fc1", "transpose"),
            "mlp.fc1.bias": ("visual.blocks.b1", None),
            "mlp.fc2.weight": ("visual.blocks.fc2", "transpose"),
            "mlp.fc2.bias": ("visual.blocks.b2", None),
        }
        return {"vision.blocks.": m}

    # ------------------------------------------------------------------
    def vision_forward(self, params, pixels: jax.Array) -> jax.Array:
        """SigLIP trunk + downsample projector:
        [N, 3, S, S] -> [N, tok_side^2, n_embed]."""
        v = params["visual"]
        N = pixels.shape[0]
        p, g, Hv = self.v_patch, self.v_grid, self.v_hidden
        nh, hd = self.v_heads, self.v_head_dim
        eps = self.v_eps
        x = pixels.reshape(N, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N, g * g, 3 * p * p).astype(v["patch_embed"].dtype)
        x = x @ v["patch_embed"] + v["patch_bias"]
        x = x + v["pos_embed"].astype(x.dtype)[None]
        scale = hd**-0.5

        def block(carry, lp):
            x = carry
            h = _ln(x, lp["ln1_w"], lp["ln1_b"], eps)
            T = h.shape[1]
            qkv = h @ lp["wqkv"] + lp["bqkv"]
            q, k, vv = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(N, T, nh, hd)
            k = k.reshape(N, T, nh, hd)
            vv = vv.reshape(N, T, nh, hd)
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            pr = jax.nn.softmax(s, axis=-1).astype(vv.dtype)
            o = jnp.einsum(
                "bhqk,bkhd->bqhd", pr, vv, preferred_element_type=jnp.float32
            ).astype(x.dtype).reshape(N, T, Hv)
            x = x + (o @ lp["wo"] + lp["bo"])
            h2 = _ln(x, lp["ln2_w"], lp["ln2_b"], eps)
            m = jax.nn.gelu(
                (h2 @ lp["fc1"] + lp["b1"]).astype(jnp.float32),
                approximate=False,
            ).astype(x.dtype)
            return x + (m @ lp["fc2"] + lp["b2"]), None

        x, _ = jax.lax.scan(block, x, v["blocks"])
        x = _ln(x, v["post_ln_w"], v["post_ln_b"], eps)

        # downsample projector: channel-major r x r unfold (F.unfold order)
        r = self.down
        gp = -(-g // r) * r
        x = x.reshape(N, g, g, Hv)
        if gp != g:
            x = jnp.pad(x, ((0, 0), (0, gp - g), (0, gp - g), (0, 0)))
        x = x.reshape(N, gp // r, r, gp // r, r, Hv)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(
            N, (gp // r) ** 2, Hv * r * r
        )
        x = jax.nn.gelu(
            (x @ v["proj1_w"] + v["proj1_b"]).astype(jnp.float32),
            approximate=False,
        ).astype(x.dtype)
        return x @ v["proj2_w"] + v["proj2_b"]

    def compute_vision_embeds(self, params, mm, vision_fn) -> jax.Array:
        """Run all tiles through the tower, then assemble the per-image
        global/local layout with newline + separator embeddings."""
        pixels = jnp.asarray(np.asarray(mm["pixel_values"], np.float32))
        crops = np.asarray(mm["images_spatial_crop"], np.int64).reshape(-1, 2)
        embeds = vision_fn(params, pixels)  # [n_tiles, hw, Dt]
        v = params["visual"]
        nl = v["image_newline"].astype(embeds.dtype)
        sep = v["view_seperator"].astype(embeds.dtype)
        h = w = self.tok_side
        out = []
        tile = 0
        for wi, hi in crops:
            wi, hi = int(wi), int(hi)
            if wi == 0 or hi == 0:
                break
            g = embeds[tile].reshape(h, w, -1)
            g = jnp.concatenate(
                [g, jnp.broadcast_to(nl, (h, 1, nl.shape[-1]))], axis=1
            ).reshape(h * (w + 1), -1)
            loc = embeds[tile + 1 : tile + 1 + wi * hi]
            tile += wi * hi + 1
            loc = loc.reshape(hi, wi, h, w, -1).transpose(0, 2, 1, 3, 4)
            loc = loc.reshape(hi * h, wi * w, -1)
            loc = jnp.concatenate(
                [loc, jnp.broadcast_to(nl, (hi * h, 1, nl.shape[-1]))],
                axis=1,
            ).reshape(hi * h * (wi * w + 1), -1)
            out.append(jnp.concatenate([g, sep[None], loc], axis=0))
        return jnp.concatenate(out, axis=0)


ENTRY_CLASS = DeepseekVL2ForCausalLM
