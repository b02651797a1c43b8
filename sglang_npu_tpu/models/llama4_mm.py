"""Llama-4 vision (Scout/Maverick multimodal, "mllama4").

Behavioral counterpart of the reference's `srt/models/mllama4.py` (HF
spec `modeling_llama4.py`: Llama4VisionModel + Llama4ForConditionalGeneration):

  * unfold-convolution patch embed (patch p, stride p, linear, no bias)
  * CLS token APPENDED (last position), learned absolute positions
  * LayerNorm pre/post around the encoder; encoder layers are LN ->
    biased qkv/o MHA -> LN -> biased fc1/gelu/fc2
  * 2-D vision rope: per-patch (x+1, y+1) coordinates against a
    head_dim/4-long inverse-frequency ladder, interleaved-pair rotation,
    frequencies ZERO on the CLS row (`Llama4VisionRotaryEmbedding`)
  * drop CLS -> pixel shuffle (ratio r packs r^2 patches into channels)
    -> MLP2 (fc1/gelu/fc2/gelu, no biases) -> projector linear (no bias)
    into the text hidden size
  * image placeholder tokens replaced 1:1 by projected patch embeddings

The text trunk is this repo's Llama-4 decoder (NoPE/chunked attention,
interleaved MoE) — `models/llama4.py`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.llama4 import Llama4ForCausalLM
from sglang_npu_tpu.models.llava import _layer_norm


class Llama4VLForConditionalGeneration(Llama4ForCausalLM):
    is_multimodal = True

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        vc = hf.get("vision_config", {})
        self.v_hidden = vc.get("hidden_size", 768)
        self.v_layers = vc.get("num_hidden_layers", 34)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.v_head_dim = self.v_hidden // self.v_heads
        self.v_inter = vc.get("intermediate_size", 5632)
        self.v_patch = vc.get("patch_size", 14)
        self.v_img = vc.get("image_size", 448)
        self.v_grid = self.v_img // self.v_patch
        self.v_tokens = self.v_grid**2
        self.v_eps = vc.get("norm_eps", 1e-5)
        self.v_ratio = vc.get("pixel_shuffle_ratio", 0.5)
        self.v_proj_in = vc.get("projector_input_dim", 4096)
        self.v_proj_out = vc.get("projector_output_dim", 4096)
        self.v_out_dim = vc.get("vision_output_dim", self.v_proj_out)
        self.image_token_id = hf.get("image_token_id") or hf.get(
            "image_token_index"
        )
        # 2-D rope tables (cos/sin per (token, pair)); CLS row frequency 0
        g = self.v_grid
        hd = self.v_head_dim
        theta = float(vc.get("rope_theta", 10000))
        fd = hd // 2
        rope_freq = 1.0 / theta ** (
            np.arange(0, fd, 2)[: fd // 2].astype(np.float64) / fd
        )
        pos = np.arange(self.v_tokens)
        fx = (pos % g + 1)[:, None] * rope_freq[None, :]
        fy = (pos // g + 1)[:, None] * rope_freq[None, :]
        # HF interleaves each then takes [..., ::2] of the concat — which
        # is exactly [fx, fy] per pair index
        freqs = np.concatenate([fx, fy], axis=-1)  # [T, hd/2]
        freqs = np.concatenate([freqs, np.zeros((1, fd))], axis=0)  # CLS
        self.v_rope_cos = np.cos(freqs).astype(np.float32)
        self.v_rope_sin = np.sin(freqs).astype(np.float32)

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        dt = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        Hv, F, L = self.v_hidden, self.v_inter, self.v_layers
        shapes["visual"] = {
            "patch_embed": ((3 * self.v_patch**2, Hv), dt),
            "cls_token": ((Hv,), dt),
            "pos_embed": ((self.v_tokens + 1, Hv), dt),
            "ln_pre_w": ((Hv,), jnp.float32),
            "ln_pre_b": ((Hv,), jnp.float32),
            "ln_post_w": ((Hv,), jnp.float32),
            "ln_post_b": ((Hv,), jnp.float32),
            "blocks": {
                "ln1_w": ((L, Hv), jnp.float32),
                "ln1_b": ((L, Hv), jnp.float32),
                "ln2_w": ((L, Hv), jnp.float32),
                "ln2_b": ((L, Hv), jnp.float32),
                "wq": ((L, Hv, Hv), dt),
                "bq": ((L, Hv), dt),
                "wk": ((L, Hv, Hv), dt),
                "bk": ((L, Hv), dt),
                "wv": ((L, Hv, Hv), dt),
                "bv": ((L, Hv), dt),
                "wo": ((L, Hv, Hv), dt),
                "bo": ((L, Hv), dt),
                "fc1": ((L, Hv, F), dt),
                "b1": ((L, F), dt),
                "fc2": ((L, F, Hv), dt),
                "b2": ((L, Hv), dt),
            },
            "mlp2_fc1": ((self.v_inter, self.v_proj_in), dt),
            "mlp2_fc2": ((self.v_proj_out, self.v_proj_out), dt),
            "proj": ((self.v_out_dim, self.config.hidden_size), dt),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        shapes = self.param_shapes()["visual"]

        def spec_for(name, shp):
            if name in ("wq", "wk", "wv", "fc1"):
                return P(None, None, "model")
            if name in ("bq", "bk", "bv", "b1"):
                return P(None, "model")
            if name in ("wo", "fc2"):
                return P(None, "model", None)
            return P(*([None] * len(shp)))

        specs["visual"] = {
            k: ({bk: spec_for(bk, bs[0]) for bk, bs in v.items()}
                if k == "blocks" else spec_for(k, v[0]))
            for k, v in shapes.items()
        }
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        vm = "vision_model."
        top.update({
            vm + "patch_embedding.linear.weight": (
                "visual.patch_embed", "transpose",
            ),
            vm + "class_embedding": ("visual.cls_token", None),
            vm + "positional_embedding_vlm": ("visual.pos_embed", None),
            vm + "layernorm_pre.weight": ("visual.ln_pre_w", None),
            vm + "layernorm_pre.bias": ("visual.ln_pre_b", None),
            vm + "layernorm_post.weight": ("visual.ln_post_w", None),
            vm + "layernorm_post.bias": ("visual.ln_post_b", None),
            vm + "vision_adapter.mlp.fc1.weight": (
                "visual.mlp2_fc1", "transpose",
            ),
            vm + "vision_adapter.mlp.fc2.weight": (
                "visual.mlp2_fc2", "transpose",
            ),
            "multi_modal_projector.linear_1.weight": (
                "visual.proj", "transpose",
            ),
        })
        return top, per_layer

    def hf_block_maps(self):
        maps = dict(getattr(super(), "hf_block_maps", lambda: {})())
        m = {
            "input_layernorm.weight": "ln1_w",
            "input_layernorm.bias": "ln1_b",
            "post_attention_layernorm.weight": "ln2_w",
            "post_attention_layernorm.bias": "ln2_b",
            "self_attn.q_proj.weight": "wq",
            "self_attn.q_proj.bias": "bq",
            "self_attn.k_proj.weight": "wk",
            "self_attn.k_proj.bias": "bk",
            "self_attn.v_proj.weight": "wv",
            "self_attn.v_proj.bias": "bv",
            "self_attn.o_proj.weight": "wo",
            "self_attn.o_proj.bias": "bo",
            "mlp.fc1.weight": "fc1",
            "mlp.fc1.bias": "b1",
            "mlp.fc2.weight": "fc2",
            "mlp.fc2.bias": "b2",
        }
        bm = {
            hf_name: (
                f"visual.blocks.{ours}",
                "transpose" if hf_name.endswith("weight") and "norm" not in
                hf_name else None,
            )
            for hf_name, ours in m.items()
        }
        maps["vision_model.model.layers."] = bm
        return maps

    # ------------------------------------------------------------------
    def compute_vision_embeds(self, params, mm, vision_fn) -> jax.Array:
        pixels = np.asarray(mm["pixel_values"], dtype=np.float32)
        N = pixels.shape[0]
        Nb = 1 << (N - 1).bit_length() if N > 1 else 1
        if Nb != N:
            pixels = np.pad(pixels, ((0, Nb - N), (0, 0), (0, 0), (0, 0)))
        out = vision_fn(params, jnp.asarray(pixels))  # [Nb, tok, D]
        return out[:N].reshape(N * out.shape[1], out.shape[2])

    def _v_rope(self, x, cos, sin):
        """Interleaved-pair rotation: adjacent (even, odd) dims are
        (re, im); freqs broadcast [T, hd/2] -> [N, T, nh, hd/2]."""
        x32 = x.astype(jnp.float32)
        re, im = x32[..., 0::2], x32[..., 1::2]
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
        out_re = re * c - im * s
        out_im = re * s + im * c
        return (
            jnp.stack([out_re, out_im], axis=-1).reshape(x.shape)
        ).astype(x.dtype)

    def vision_forward(self, params, pixels: jax.Array) -> jax.Array:
        """Llama4VisionModel + pixel-shuffle adapter + projector:
        pixels [N, 3, H, W] -> [N, (g*r)^2, text_hidden]."""
        v = params["visual"]
        N = pixels.shape[0]
        p, g, Hv = self.v_patch, self.v_grid, self.v_hidden
        nh, hd = self.v_heads, self.v_head_dim
        # unfold: per patch the feature order is (c, ph, pw)
        x = pixels.reshape(N, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N, g * g, 3 * p * p).astype(v["patch_embed"].dtype)
        x = x @ v["patch_embed"]
        cls = jnp.broadcast_to(v["cls_token"], (N, 1, Hv)).astype(x.dtype)
        x = jnp.concatenate([x, cls], axis=1)  # CLS LAST
        x = x + v["pos_embed"].astype(x.dtype)[None]
        x = _layer_norm(x, v["ln_pre_w"], v["ln_pre_b"], self.v_eps)

        cos = jnp.asarray(self.v_rope_cos)
        sin = jnp.asarray(self.v_rope_sin)
        T = self.v_tokens + 1
        scale = hd**-0.5
        gelu = lambda t: jax.nn.gelu(t.astype(jnp.float32), approximate=False)

        def block(carry, lp):
            x = carry
            h = _layer_norm(x, lp["ln1_w"], lp["ln1_b"], self.v_eps)
            q = (h @ lp["wq"] + lp["bq"]).reshape(N, T, nh, hd)
            k = (h @ lp["wk"] + lp["bk"]).reshape(N, T, nh, hd)
            vv = (h @ lp["wv"] + lp["bv"]).reshape(N, T, nh, hd)
            q = self._v_rope(q, cos, sin)
            k = self._v_rope(k, cos, sin)
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            pr = jax.nn.softmax(s, axis=-1).astype(vv.dtype)
            o = jnp.einsum(
                "bhqk,bkhd->bqhd", pr, vv,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype).reshape(N, T, Hv)
            x = x + (o @ lp["wo"] + lp["bo"])
            h2 = _layer_norm(x, lp["ln2_w"], lp["ln2_b"], self.v_eps)
            m = gelu(h2 @ lp["fc1"] + lp["b1"]).astype(x.dtype)
            x = x + (m @ lp["fc2"] + lp["b2"])
            return x, None

        x, _ = jax.lax.scan(block, x, v["blocks"])
        x = _layer_norm(x, v["ln_post_w"], v["ln_post_b"], self.v_eps)
        x = x[:, :-1]  # drop CLS (last)

        # pixel shuffle (HF `pixel_shuffle`, ratio r)
        r = self.v_ratio
        f, C = g, Hv
        x = x.reshape(N, f, f, C)
        x = x.reshape(N, f, int(f * r), int(C / r))
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(N, int(f * r), int(f * r), int(C / (r * r)))
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(N, int(f * r) * int(f * r), int(C / (r * r)))

        x = gelu(x @ v["mlp2_fc1"]).astype(x.dtype)
        x = gelu(x @ v["mlp2_fc2"]).astype(x.dtype)
        return x @ v["proj"]


ENTRY_CLASS = Llama4VLForConditionalGeneration
