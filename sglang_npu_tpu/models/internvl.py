"""InternVL (3.x HF layout): InternViT tower + pixel-shuffle projector
over a Qwen2 LM trunk.

Behavioral counterpart of the reference's `srt/models/internvl.py` /
`interns1.py` with the HF `InternVLForConditionalGeneration` layout:
timm-style ViT (cls token, learnable absolute positions, layer-scale
lambda_1/lambda_2, pre/post block norms that are LayerNorm or RMSNorm by
`norm_type`, optional full-width qk RMS norm), pixel-shuffle 2x2
downsample, then LayerNorm + 2-layer gelu projector into the text hidden
size.  The LM consumes spliced embeddings via `fb.input_embeds`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.layers.ops import rms_norm
from sglang_npu_tpu.models.llama import LlamaForCausalLM
from sglang_npu_tpu.models.llava import _layer_norm


def _first(x):
    return x[0] if isinstance(x, (list, tuple)) else x


class InternVLForCausalLM(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        vc = hf.get("vision_config", {})
        self.vision_cfg = vc
        self.v_hidden = vc.get("hidden_size", 1024)
        self.v_layers = vc.get("num_hidden_layers", 24)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.v_head_dim = self.v_hidden // self.v_heads
        self.v_inter = vc.get("intermediate_size", 4096)
        self.v_patch = _first(vc.get("patch_size", [14, 14]))
        self.v_img = _first(vc.get("image_size", [448, 448]))
        self.v_grid = self.v_img // self.v_patch
        self.v_tokens = self.v_grid**2
        self.v_eps = vc.get("layer_norm_eps", 1e-6)
        self.v_rms = vc.get("norm_type", "layer_norm") == "rms_norm"
        self.v_qk_norm = vc.get("use_qk_norm", False)
        self.v_attn_bias = vc.get("attention_bias", False)
        self.v_abs_pos = vc.get("use_absolute_position_embeddings", True)
        self.v_act = vc.get("hidden_act", "gelu")
        self.downsample = hf.get("downsample_ratio", 0.5)
        self.proj_act = hf.get("projector_hidden_act", "gelu")
        self.image_token_id = hf.get("image_token_id") or hf.get(
            "image_token_index"
        )

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        dt = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        Hv, F, L = self.v_hidden, self.v_inter, self.v_layers
        Dt = self.config.hidden_size
        ch = int(Hv * int(1 / self.downsample) ** 2)
        blocks = {
            "ln1_w": ((L, Hv), jnp.float32),
            "ln2_w": ((L, Hv), jnp.float32),
            "wq": ((L, Hv, Hv), dt),
            "wk": ((L, Hv, Hv), dt),
            "wv": ((L, Hv, Hv), dt),
            "wo": ((L, Hv, Hv), dt),
            "bo": ((L, Hv), dt),
            "lambda1": ((L, Hv), jnp.float32),
            "lambda2": ((L, Hv), jnp.float32),
            "fc1": ((L, Hv, F), dt),
            "b1": ((L, F), dt),
            "fc2": ((L, F, Hv), dt),
            "b2": ((L, Hv), dt),
        }
        if not self.v_rms:
            blocks["ln1_b"] = ((L, Hv), jnp.float32)
            blocks["ln2_b"] = ((L, Hv), jnp.float32)
        if self.v_attn_bias:
            blocks["bq"] = ((L, Hv), dt)
            blocks["bk"] = ((L, Hv), dt)
            blocks["bv"] = ((L, Hv), dt)
        if self.v_qk_norm:
            blocks["q_norm"] = ((L, Hv), jnp.float32)
            blocks["k_norm"] = ((L, Hv), jnp.float32)
        shapes["visual"] = {
            "cls_token": ((Hv,), dt),
            "patch_embed": ((3 * self.v_patch**2, Hv), dt),
            "patch_bias": ((Hv,), dt),
            "blocks": blocks,
            "proj_ln_w": ((ch,), jnp.float32),
            "proj_ln_b": ((ch,), jnp.float32),
            "proj_fc1": ((ch, Dt), dt),
            "proj_b1": ((Dt,), dt),
            "proj_fc2": ((Dt, Dt), dt),
            "proj_b2": ((Dt,), dt),
        }
        if self.v_abs_pos:
            shapes["visual"]["pos_embed"] = ((self.v_tokens + 1, Hv), dt)
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        shapes = self.param_shapes()["visual"]

        def spec_for(name, shp):
            nd = len(shp)
            if name in ("wq", "wk", "wv", "fc1"):
                return P(None, None, "model")
            if name in ("bq", "bk", "bv", "b1"):
                return P(None, "model")
            if name in ("wo", "fc2"):
                return P(None, "model", None)
            return P(*([None] * nd))

        specs["visual"] = {
            k: ({bk: spec_for(bk, bs[0]) for bk, bs in v.items()}
                if k == "blocks" else spec_for(k, v[0]))
            for k, v in shapes.items()
        }
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        pre = "vision_tower."
        vis_top = {
            pre + "embeddings.cls_token": ("visual.cls_token", "squeeze"),
            pre + "embeddings.patch_embeddings.projection.weight": (
                "visual.patch_embed", "flatten_oc_transpose",
            ),
            pre + "embeddings.patch_embeddings.projection.bias": (
                "visual.patch_bias", None,
            ),
            "multi_modal_projector.layer_norm.weight": ("visual.proj_ln_w", None),
            "multi_modal_projector.layer_norm.bias": ("visual.proj_ln_b", None),
            "multi_modal_projector.linear_1.weight": ("visual.proj_fc1", "transpose"),
            "multi_modal_projector.linear_1.bias": ("visual.proj_b1", None),
            "multi_modal_projector.linear_2.weight": ("visual.proj_fc2", "transpose"),
            "multi_modal_projector.linear_2.bias": ("visual.proj_b2", None),
        }
        if self.v_abs_pos:
            vis_top[pre + "embeddings.position_embeddings"] = (
                "visual.pos_embed", "reshape",
            )
        for k, v in list(vis_top.items()):
            vis_top["model." + k] = v
        top.update(vis_top)
        return top, per_layer

    def hf_block_maps(self):
        m = {
            "ln1_w": ("layernorm_before.weight", "transpose_no"),
            "ln2_w": ("layernorm_after.weight", "transpose_no"),
            "wq": ("attention.q_proj.weight", "transpose"),
            "wk": ("attention.k_proj.weight", "transpose"),
            "wv": ("attention.v_proj.weight", "transpose"),
            "wo": ("attention.projection_layer.weight", "transpose"),
            "bo": ("attention.projection_layer.bias", None),
            "lambda1": ("lambda_1", "transpose_no"),
            "lambda2": ("lambda_2", "transpose_no"),
            "fc1": ("mlp.fc1.weight", "transpose"),
            "b1": ("mlp.fc1.bias", None),
            "fc2": ("mlp.fc2.weight", "transpose"),
            "b2": ("mlp.fc2.bias", None),
        }
        if not self.v_rms:
            m["ln1_b"] = ("layernorm_before.bias", None)
            m["ln2_b"] = ("layernorm_after.bias", None)
        if self.v_attn_bias:
            m["bq"] = ("attention.q_proj.bias", None)
            m["bk"] = ("attention.k_proj.bias", None)
            m["bv"] = ("attention.v_proj.bias", None)
        if self.v_qk_norm:
            m["q_norm"] = ("attention.q_norm.weight", None)
            m["k_norm"] = ("attention.k_norm.weight", None)
        bm = {}
        for ours, (hf_name, tr) in m.items():
            bm[hf_name] = (
                f"visual.blocks.{ours}", tr if tr != "transpose_no" else None
            )
        return {"vision_tower.encoder.layer.": bm}

    # ------------------------------------------------------------------
    def compute_vision_embeds(self, params, mm, vision_fn) -> jax.Array:
        pixels = np.asarray(mm["pixel_values"], dtype=np.float32)
        N = pixels.shape[0]
        Nb = 1 << (N - 1).bit_length() if N > 1 else 1
        if Nb != N:
            pixels = np.pad(pixels, ((0, Nb - N), (0, 0), (0, 0), (0, 0)))
        out = vision_fn(params, jnp.asarray(pixels))  # [Nb, tok, Dt]
        return out[:N].reshape(N * out.shape[1], out.shape[2])

    def _norm(self, x, w, b):
        if self.v_rms:
            return rms_norm(x, w, self.v_eps)
        return _layer_norm(x, w, b, self.v_eps)

    def vision_forward(self, params, pixels: jax.Array) -> jax.Array:
        """InternViT trunk + pixel shuffle + projector.
        pixels [N, 3, H, W] -> [N, (g*ds)^2, text_hidden]."""
        v = params["visual"]
        N = pixels.shape[0]
        p, g, Hv = self.v_patch, self.v_grid, self.v_hidden
        nh, hd = self.v_heads, self.v_head_dim
        x = pixels.reshape(N, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N, g * g, 3 * p * p).astype(v["patch_embed"].dtype)
        x = x @ v["patch_embed"] + v["patch_bias"]
        cls = jnp.broadcast_to(v["cls_token"], (N, 1, Hv)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)  # [N, T+1, Hv]
        if self.v_abs_pos:
            x = x + v["pos_embed"].astype(x.dtype)[None]

        act = (
            (lambda t: jax.nn.gelu(t, approximate=False))
            if self.v_act == "gelu"
            else (lambda t: jax.nn.gelu(t, approximate=True))
        )
        scale = hd**-0.5
        T = self.v_tokens + 1

        def block(carry, lp):
            x = carry
            h = self._norm(x, lp["ln1_w"], lp.get("ln1_b"))
            q = h @ lp["wq"]
            k = h @ lp["wk"]
            vv = h @ lp["wv"]
            if "bq" in lp:
                q, k, vv = q + lp["bq"], k + lp["bk"], vv + lp["bv"]
            if "q_norm" in lp:
                # full-width RMS norm before head split
                q = rms_norm(q, lp["q_norm"], 1e-6)
                k = rms_norm(k, lp["k_norm"], 1e-6)
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
            o = o @ lp["wo"] + lp["bo"]
            x = x + o * lp["lambda1"].astype(x.dtype)
            h2 = self._norm(x, lp["ln2_w"], lp.get("ln2_b"))
            m = act((h2 @ lp["fc1"] + lp["b1"]).astype(jnp.float32)).astype(
                x.dtype
            )
            m = m @ lp["fc2"] + lp["b2"]
            return x + m * lp["lambda2"].astype(x.dtype), None

        x, _ = jax.lax.scan(block, x, v["blocks"])

        x = x[:, 1:]  # drop CLS ("default" strategy)
        # pixel shuffle (HF InternVLModel.pixel_shuffle, scale s):
        # [N, f, f, C] -> [N, f*s, f*s, C/s^2]
        s = self.downsample
        f = g
        C = Hv
        x = x.reshape(N, f, f, C)
        x = x.reshape(N, f, int(f * s), int(C / s))
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(N, int(f * s), int(f * s), int(C / (s * s)))
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(N, int(f * s) * int(f * s), int(C / (s * s)))

        x = _layer_norm(x, v["proj_ln_w"], v["proj_ln_b"], 1e-5)
        pact = (
            (lambda t: jax.nn.gelu(t, approximate=False))
            if self.proj_act == "gelu"
            else (lambda t: jax.nn.gelu(t, approximate=True))
        )
        x = pact((x @ v["proj_fc1"] + v["proj_b1"]).astype(jnp.float32)).astype(
            x.dtype
        )
        return x @ v["proj_fc2"] + v["proj_b2"]


ENTRY_CLASS = InternVLForCausalLM
