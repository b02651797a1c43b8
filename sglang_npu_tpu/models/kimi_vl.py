"""Kimi-VL: MoonViT native-resolution tower over the DeepSeek-V2 MLA LM.

Counterpart of the reference's `srt/models/kimi_vl.py:1` +
`kimi_vl_moonvit.py:1` (behavioral spec — the HF checkpoint is
remote-code):

  * MoonViT: packed-patch embed (conv = matmul over [3*ps*ps]),
    bicubic-interpolated learnable 2D pos emb, blocks with fused wqkv /
    2D rope (interleaved x/y complex pairs, `Rope2DPosEmb`,
    theta 10000, per-position angles axis=k%2, freq 4*(k//2)/hd) /
    exact-GELU MLP2, final LN, then a 2x2 `patch_merger`;
  * projector: pre-LN on [T/4, 4, D] -> view [T/4, 4D] -> linear ->
    QuickGELU -> linear into the text hidden (`KimiVLMultiModalProjector`);
  * language model: DeepSeek-V2 under the `language_model.` prefix.

Each image runs the tower separately (a per-image call IS the packed
block-diagonal attention of the reference); the interpolated pos-emb is
computed eagerly per grid and passed in, so the jitted tower retraces
only per image shape."""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class KimiVLForCausalLM(DeepseekV2ForCausalLM):
    is_multimodal = True

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        vc = hf.get("vision_config", {}) or {}
        self.v_hidden = vc.get("hidden_size", 1152)
        self.v_layers = vc.get("num_hidden_layers", 27)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.v_head_dim = self.v_hidden // self.v_heads
        self.v_inter = vc.get("intermediate_size", 4304)
        self.v_patch = vc.get("patch_size", 14)
        self.pe_h = vc.get("init_pos_emb_height", 64)
        self.pe_w = vc.get("init_pos_emb_width", 64)
        mk = vc.get("merge_kernel_size", (2, 2))
        self.merge = (int(mk[0]), int(mk[1]))
        self.image_token_id = hf.get(
            "media_placeholder_token_id", hf.get("image_token_id")
        )

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        dt = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        Hv, F, L = self.v_hidden, self.v_inter, self.v_layers
        Dt = self.config.hidden_size
        mh = self.merge[0] * self.merge[1]
        shapes["visual"] = {
            "patch_embed": ((3 * self.v_patch**2, Hv), dt),
            "patch_bias": ((Hv,), dt),
            "pos_emb": ((self.pe_h, self.pe_w, Hv), jnp.float32),
            "blocks": {
                "ln0_w": ((L, Hv), jnp.float32),
                "ln0_b": ((L, Hv), jnp.float32),
                "wqkv": ((L, Hv, 3 * Hv), dt),
                "bqkv": ((L, 3 * Hv), dt),
                "wo": ((L, Hv, Hv), dt),
                "bo": ((L, Hv), dt),
                "ln1_w": ((L, Hv), jnp.float32),
                "ln1_b": ((L, Hv), jnp.float32),
                "fc0": ((L, Hv, F), dt),
                "b0": ((L, F), dt),
                "fc1": ((L, F, Hv), dt),
                "b1": ((L, Hv), dt),
            },
            "final_ln_w": ((Hv,), jnp.float32),
            "final_ln_b": ((Hv,), jnp.float32),
            "pre_norm_w": ((Hv,), jnp.float32),
            "pre_norm_b": ((Hv,), jnp.float32),
            "proj1_w": ((Hv * mh, Hv * mh), dt),
            "proj1_b": ((Hv * mh,), dt),
            "proj2_w": ((Hv * mh, Dt), dt),
            "proj2_b": ((Dt,), dt),
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
        # the loader normalizes the "language_model.model." /
        # "language_model.lm_head." checkpoint nesting away (llava-style
        # VLM prefixes), so the LM entries stay unprefixed here
        lm_top, _ = super().hf_weight_map()
        top = dict(lm_top)
        pre = "vision_tower."
        top.update({
            pre + "patch_embed.proj.weight": (
                "visual.patch_embed", "flatten_oc_transpose",
            ),
            pre + "patch_embed.proj.bias": ("visual.patch_bias", None),
            pre + "patch_embed.pos_emb.weight": ("visual.pos_emb", None),
            pre + "encoder.final_layernorm.weight": ("visual.final_ln_w", None),
            pre + "encoder.final_layernorm.bias": ("visual.final_ln_b", None),
            "multi_modal_projector.pre_norm.weight": ("visual.pre_norm_w", None),
            "multi_modal_projector.pre_norm.bias": ("visual.pre_norm_b", None),
            "multi_modal_projector.linear_1.weight": ("visual.proj1_w", "transpose"),
            "multi_modal_projector.linear_1.bias": ("visual.proj1_b", None),
            "multi_modal_projector.linear_2.weight": ("visual.proj2_w", "transpose"),
            "multi_modal_projector.linear_2.bias": ("visual.proj2_b", None),
        })
        return top, {}

    def hf_block_maps(self):
        m = {
            "norm0.weight": ("visual.blocks.ln0_w", None),
            "norm0.bias": ("visual.blocks.ln0_b", None),
            "wqkv.weight": ("visual.blocks.wqkv", "transpose"),
            "wqkv.bias": ("visual.blocks.bqkv", None),
            "wo.weight": ("visual.blocks.wo", "transpose"),
            "wo.bias": ("visual.blocks.bo", None),
            "norm1.weight": ("visual.blocks.ln1_w", None),
            "norm1.bias": ("visual.blocks.ln1_b", None),
            "mlp.fc0.weight": ("visual.blocks.fc0", "transpose"),
            "mlp.fc0.bias": ("visual.blocks.b0", None),
            "mlp.fc1.weight": ("visual.blocks.fc1", "transpose"),
            "mlp.fc1.bias": ("visual.blocks.b1", None),
        }
        return {"vision_tower.encoder.blocks.": m}

    # ------------------------------------------------------------------
    def _rope_cs(self, h: int, w: int):
        """Interleaved 2D rope angles [T, hd/2] (x_cis, y_cis pairs)."""
        hd = self.v_head_dim
        T = h * w
        ys, xs = np.divmod(np.arange(T), w)
        freqs = 1.0 / (10000.0 ** (np.arange(0, hd, 4)[: hd // 4] / hd))
        xa = np.outer(xs, freqs)  # [T, hd/4]
        ya = np.outer(ys, freqs)
        ang = np.stack([xa, ya], axis=-1).reshape(T, hd // 2)
        return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)

    def vision_forward(self, params, x, pos_add, cos, sin) -> jax.Array:
        """One image: packed patches [T, 3*ps^2] (+ per-position pos-emb
        rows and rope angle tables) -> merged tokens [T/mh, text_hidden]."""
        v = params["visual"]
        Hv, nh, hd = self.v_hidden, self.v_heads, self.v_head_dim
        T = x.shape[0]
        x = x.astype(v["patch_embed"].dtype) @ v["patch_embed"] + v["patch_bias"]
        x = x + pos_add.astype(x.dtype)

        def rope(t):  # [T, nh, hd] interleaved complex mult
            tr = t.reshape(T, nh, hd // 2, 2).astype(jnp.float32)
            a, b = tr[..., 0], tr[..., 1]
            c = cos[:, None, :]
            s = sin[:, None, :]
            return jnp.stack(
                [a * c - b * s, a * s + b * c], axis=-1
            ).reshape(T, nh, hd).astype(t.dtype)

        def block(carry, lp):
            x = carry
            h = _ln(x, lp["ln0_w"], lp["ln0_b"])
            qkv = h @ lp["wqkv"] + lp["bqkv"]
            qkv = qkv.reshape(T, 3, nh, hd)
            q, k, vv = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            q, k = rope(q), rope(k)
            s = jnp.einsum(
                "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            pr = jax.nn.softmax(s, axis=-1).astype(vv.dtype)
            o = jnp.einsum(
                "hqk,khd->qhd", pr, vv, preferred_element_type=jnp.float32
            ).astype(x.dtype).reshape(T, Hv)
            x = x + (o @ lp["wo"] + lp["bo"])
            h2 = _ln(x, lp["ln1_w"], lp["ln1_b"])
            m = jax.nn.gelu(
                (h2 @ lp["fc0"] + lp["b0"]).astype(jnp.float32),
                approximate=False,
            ).astype(x.dtype)
            return x + (m @ lp["fc1"] + lp["b1"]), None

        x, _ = jax.lax.scan(block, x, v["blocks"])
        x = _ln(x, v["final_ln_w"], v["final_ln_b"])
        return x

    def _project(self, params, merged):
        """[T', mh, Hv] merged groups -> [T', Dt] (pre-LN + MLP)."""
        v = params["visual"]
        mh = self.merge[0] * self.merge[1]
        x = _ln(merged, v["pre_norm_w"], v["pre_norm_b"])
        x = x.reshape(-1, mh * self.v_hidden)
        x = x @ v["proj1_w"] + v["proj1_b"]
        x = (x * jax.nn.sigmoid(1.702 * x.astype(jnp.float32)).astype(x.dtype))
        return x @ v["proj2_w"] + v["proj2_b"]

    def compute_vision_embeds(self, params, mm, vision_fn) -> jax.Array:
        pixels = np.asarray(mm["pixel_values"], np.float32)
        grids = np.asarray(mm["image_grid_hws"], np.int64).reshape(-1, 2)
        kh, kw = self.merge
        v = params["visual"]
        outs = []
        off = 0
        for h, w in grids:
            h, w = int(h), int(w)
            T = h * w
            x = jnp.asarray(pixels[off : off + T].reshape(T, -1))
            off += T
            if (h, w) == (self.pe_h, self.pe_w):
                pos = params["visual"]["pos_emb"].reshape(-1, self.v_hidden)
            else:
                pos = jax.image.resize(
                    v["pos_emb"], (h, w, self.v_hidden), method="bicubic"
                ).reshape(-1, self.v_hidden)
            cos, sin = self._rope_cs(h, w)
            tokens = vision_fn(
                params, x, pos, jnp.asarray(cos), jnp.asarray(sin)
            )  # [T, Hv]
            # 2x2 patch merger (reference patch_merger)
            t = tokens.reshape(h // kh, kh, w // kw, kw, self.v_hidden)
            t = t.transpose(0, 2, 1, 3, 4).reshape(-1, kh * kw, self.v_hidden)
            outs.append(self._project(params, t))
        return jnp.concatenate(outs, axis=0)


ENTRY_CLASS = KimiVLForCausalLM
