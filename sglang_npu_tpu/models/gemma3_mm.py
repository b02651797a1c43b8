"""Gemma-3 multimodal: SigLIP ViT tower + avg-pool projector over the
Gemma-3 text decoder.

Behavioral counterpart of the reference's `srt/models/gemma3_mm.py`
(Gemma3MultiModalProjector:58, bidirectional image masks :249): a plain
SigLIP vision transformer (conv patch embed with bias, learned positions,
no class token, pre-LN blocks, gelu-tanh MLP, post layernorm), then the
gemma projector — avg-pool the patch grid down to ``mm_tokens_per_image``
soft tokens, gemma RMS-norm, and a bias-free matmul into the text hidden
size.

Gemma-3 image tokens attend BIDIRECTIONALLY within the same image: the
runner attaches a per-position image-group map (`fb.mm_groups`) and the
XLA attention ops OR a same-group mask over the causal/sliding masks
(HF `token_type_ids_mask_function` semantics).  This forces the XLA
attention backend and the non-hybrid KV pool for this model.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.gemma2 import gemma_rms_norm
from sglang_npu_tpu.models.gemma3 import Gemma3ForCausalLM


def _layer_norm(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class Gemma3ForConditionalGeneration(Gemma3ForCausalLM):
    is_multimodal = True
    requires_xla_attention = True  # same-image bidirectional masks
    needs_mm_groups = True
    supports_hybrid_swa = False  # bidirectional override needs the full pool

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        vc = hf.get("vision_config", {})
        self.vision_cfg = vc
        self.v_hidden = vc.get("hidden_size", 1152)
        self.v_layers = vc.get("num_hidden_layers", 27)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.v_head_dim = self.v_hidden // self.v_heads
        self.v_inter = vc.get("intermediate_size", 4304)
        self.v_patch = vc.get("patch_size", 14)
        self.v_img = vc.get("image_size", 896)
        self.v_grid = self.v_img // self.v_patch
        self.v_eps = vc.get("layer_norm_eps", 1e-6)
        self.mm_tokens = int(hf.get("mm_tokens_per_image", 256))
        self.pool_side = int(self.mm_tokens**0.5)
        self.pool_k = self.v_grid // self.pool_side
        self.image_token_id = hf.get("image_token_index")

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        dt = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        Hv, F, L = self.v_hidden, self.v_inter, self.v_layers
        Dt = self.config.hidden_size
        patch_dim = 3 * self.v_patch**2
        shapes["visual"] = {
            "patch_embed": ((patch_dim, Hv), dt),
            "patch_bias": ((Hv,), dt),
            "pos_embed": ((self.v_grid**2, Hv), dt),
            "blocks": {
                "ln1_w": ((L, Hv), jnp.float32),
                "ln1_b": ((L, Hv), jnp.float32),
                "wq": ((L, Hv, Hv), dt),
                "bq": ((L, Hv), dt),
                "wk": ((L, Hv, Hv), dt),
                "bk": ((L, Hv), dt),
                "wv": ((L, Hv, Hv), dt),
                "bv": ((L, Hv), dt),
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
            "proj_norm": ((Hv,), jnp.float32),
            "proj_w": ((Hv, Dt), dt),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["visual"] = {
            "patch_embed": P(),
            "patch_bias": P(),
            "pos_embed": P(),
            "blocks": {
                "ln1_w": P(None, None),
                "ln1_b": P(None, None),
                "wq": P(None, None, "model"),
                "bq": P(None, "model"),
                "wk": P(None, None, "model"),
                "bk": P(None, "model"),
                "wv": P(None, None, "model"),
                "bv": P(None, "model"),
                "wo": P(None, "model", None),
                "bo": P(None, None),
                "ln2_w": P(None, None),
                "ln2_b": P(None, None),
                "fc1": P(None, None, "model"),
                "b1": P(None, "model"),
                "fc2": P(None, "model", None),
                "b2": P(None, None),
            },
            "post_ln_w": P(),
            "post_ln_b": P(),
            "proj_norm": P(),
            "proj_w": P(),
        }
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        pre = "vision_tower.vision_model."
        vis_top = {
            pre + "embeddings.patch_embedding.weight": (
                "visual.patch_embed", "flatten_oc_transpose",
            ),
            pre + "embeddings.patch_embedding.bias": ("visual.patch_bias", None),
            pre + "embeddings.position_embedding.weight": (
                "visual.pos_embed", None,
            ),
            pre + "post_layernorm.weight": ("visual.post_ln_w", None),
            pre + "post_layernorm.bias": ("visual.post_ln_b", None),
            "multi_modal_projector.mm_input_projection_weight": (
                "visual.proj_w", None,  # stored [Dv, Dt], used as x @ W
            ),
            "multi_modal_projector.mm_soft_emb_norm.weight": (
                "visual.proj_norm", None,
            ),
        }
        for k, v in list(vis_top.items()):
            vis_top["model." + k] = v
        top.update(vis_top)
        return top, per_layer

    def hf_block_maps(self):
        parent = getattr(super(), "hf_block_maps", None)
        maps = dict(parent() or {}) if parent else {}
        m = {
            "ln1_w": "layer_norm1.weight", "ln1_b": "layer_norm1.bias",
            "wq": "self_attn.q_proj.weight", "bq": "self_attn.q_proj.bias",
            "wk": "self_attn.k_proj.weight", "bk": "self_attn.k_proj.bias",
            "wv": "self_attn.v_proj.weight", "bv": "self_attn.v_proj.bias",
            "wo": "self_attn.out_proj.weight", "bo": "self_attn.out_proj.bias",
            "ln2_w": "layer_norm2.weight", "ln2_b": "layer_norm2.bias",
            "fc1": "mlp.fc1.weight", "b1": "mlp.fc1.bias",
            "fc2": "mlp.fc2.weight", "b2": "mlp.fc2.bias",
        }
        bm = {}
        for ours, hf_name in m.items():
            t = "transpose" if hf_name.endswith("weight") else None
            bm[hf_name] = (f"visual.blocks.{ours}", t)
        maps["vision_tower.vision_model.encoder.layers."] = bm
        return maps

    # ------------------------------------------------------------------
    def compute_vision_embeds(self, params, mm, vision_fn) -> jax.Array:
        pixels = np.asarray(mm["pixel_values"], dtype=np.float32)
        N = pixels.shape[0]
        Nb = 1 << (N - 1).bit_length() if N > 1 else 1
        if Nb != N:
            pixels = np.pad(pixels, ((0, Nb - N), (0, 0), (0, 0), (0, 0)))
        out = vision_fn(params, jnp.asarray(pixels))  # [Nb, mm_tokens, Dt]
        return out[:N].reshape(N * out.shape[1], out.shape[2])

    def vision_forward(self, params, pixels: jax.Array) -> jax.Array:
        """SigLIP trunk + gemma projector. [N, 3, S, S] ->
        [N, mm_tokens, text_hidden]."""
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
            h = _layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps)
            T = h.shape[1]
            q = (h @ lp["wq"] + lp["bq"]).reshape(N, T, nh, hd)
            k = (h @ lp["wk"] + lp["bk"]).reshape(N, T, nh, hd)
            vv = (h @ lp["wv"] + lp["bv"]).reshape(N, T, nh, hd)
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            pr = jax.nn.softmax(s, axis=-1).astype(vv.dtype)
            o = jnp.einsum(
                "bhqk,bkhd->bqhd", pr, vv, preferred_element_type=jnp.float32
            ).astype(x.dtype).reshape(N, T, Hv)
            x = x + (o @ lp["wo"] + lp["bo"])
            h2 = _layer_norm(x, lp["ln2_w"], lp["ln2_b"], eps)
            m = jax.nn.gelu(
                (h2 @ lp["fc1"] + lp["b1"]).astype(jnp.float32),
                approximate=True,  # gelu_pytorch_tanh
            ).astype(x.dtype)
            return x + (m @ lp["fc2"] + lp["b2"]), None

        x, _ = jax.lax.scan(block, x, v["blocks"])
        x = _layer_norm(x, v["post_ln_w"], v["post_ln_b"], eps)

        # projector: avg-pool the patch grid to mm_tokens soft tokens
        k, t = self.pool_k, self.pool_side
        x = x.reshape(N, g, g, Hv)
        x = x.reshape(N, t, k, t, k, Hv).mean(axis=(2, 4))  # [N, t, t, Hv]
        x = x.reshape(N, t * t, Hv)
        x = gemma_rms_norm(x, v["proj_norm"], eps)
        return x.astype(v["proj_w"].dtype) @ v["proj_w"]
