"""LLaVA: CLIP ViT tower + projector over a llama trunk.

Behavioral counterpart of the reference's `srt/models/llava.py`
(LlavaLlamaForCausalLM) with the HF `LlavaForConditionalGeneration`
layout: a plain CLIP vision transformer (class token, learned positions,
pre-LN blocks, quick-gelu MLP), feature taken from hidden_states
[vision_feature_layer] with the "default" strategy dropping the CLS
token, then a 2-layer gelu projector into the text hidden size.  The LM
consumes spliced embeddings through the generic `fb.input_embeds` /
`embed_mask` path (same splice as qwen2.5-vl).

TPU notes: the tower is a fixed-shape batched ViT (every image resizes to
`image_size`), so one jit specialization per pow2 image-count bucket; the
effective depth (feature layer) is a static slice of the stacked block
params, not a traced index.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.llama import LlamaForCausalLM


def _layer_norm(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class LlavaForConditionalGeneration(LlamaForCausalLM):
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
        self.v_patch = vc.get("patch_size", 14)
        self.v_img = vc.get("image_size", 336)
        self.v_grid = self.v_img // self.v_patch
        self.v_tokens = self.v_grid**2
        self.v_act = vc.get("hidden_act", "quick_gelu")
        fl = hf.get("vision_feature_layer", -2)
        # hidden_states has v_layers+1 entries; index -> #blocks to run
        self.v_eff_layers = fl + self.v_layers + 1 if fl < 0 else fl
        self.v_strategy = hf.get("vision_feature_select_strategy", "default")
        self.proj_act = hf.get("projector_hidden_act", "gelu")
        self.image_token_id = hf.get("image_token_index")

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        dt = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        Hv, F, L = self.v_hidden, self.v_inter, self.v_layers
        Dt = self.config.hidden_size
        patch_dim = 3 * self.v_patch**2
        shapes["visual"] = {
            "class_emb": ((Hv,), dt),
            "patch_embed": ((patch_dim, Hv), dt),
            "pos_embed": ((self.v_tokens + 1, Hv), dt),
            "pre_ln_w": ((Hv,), jnp.float32),
            "pre_ln_b": ((Hv,), jnp.float32),
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
            "proj_fc1": ((Hv, Dt), dt),
            "proj_b1": ((Dt,), dt),
            "proj_fc2": ((Dt, Dt), dt),
            "proj_b2": ((Dt,), dt),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["visual"] = {
            "class_emb": P(),
            "patch_embed": P(),
            "pos_embed": P(),
            "pre_ln_w": P(),
            "pre_ln_b": P(),
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
            "proj_fc1": P(None, "model"),
            "proj_b1": P("model"),
            "proj_fc2": P("model", None),
            "proj_b2": P(),
        }
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        pre = "vision_tower.vision_model."
        vis_top = {
            pre + "embeddings.class_embedding": ("visual.class_emb", "squeeze"),
            pre + "embeddings.patch_embedding.weight": (
                "visual.patch_embed", "flatten_oc_transpose",
            ),
            pre + "embeddings.position_embedding.weight": (
                "visual.pos_embed", None,
            ),
            pre + "pre_layrnorm.weight": ("visual.pre_ln_w", None),
            pre + "pre_layrnorm.bias": ("visual.pre_ln_b", None),
            "multi_modal_projector.linear_1.weight": (
                "visual.proj_fc1", "transpose",
            ),
            "multi_modal_projector.linear_1.bias": ("visual.proj_b1", None),
            "multi_modal_projector.linear_2.weight": (
                "visual.proj_fc2", "transpose",
            ),
            "multi_modal_projector.linear_2.bias": ("visual.proj_b2", None),
        }
        # checkpoints prefix with or without the top "model."
        for k, v in list(vis_top.items()):
            vis_top["model." + k] = v
        top.update(vis_top)
        return top, per_layer

    def hf_block_maps(self):
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
        return {"vision_tower.vision_model.encoder.layers.": bm}

    # ------------------------------------------------------------------
    def compute_vision_embeds(self, params, mm, vision_fn) -> jax.Array:
        pixels = np.asarray(mm["pixel_values"], dtype=np.float32)
        N = pixels.shape[0]
        Nb = 1 << (N - 1).bit_length() if N > 1 else 1
        if Nb != N:
            pixels = np.pad(pixels, ((0, Nb - N), (0, 0), (0, 0), (0, 0)))
        out = vision_fn(params, jnp.asarray(pixels))  # [Nb, tokens, Dt]
        return out[:N].reshape(N * out.shape[1], out.shape[2])

    def vision_forward(self, params, pixels: jax.Array) -> jax.Array:
        """CLIP ViT trunk + projector.  pixels [N, 3, H, W] ->
        [N, v_tokens, text_hidden]."""
        v = params["visual"]
        N = pixels.shape[0]
        p, g, Hv = self.v_patch, self.v_grid, self.v_hidden
        nh, hd = self.v_heads, self.v_head_dim
        # patchify in conv-kernel channel order (c, ph, pw)
        x = pixels.reshape(N, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N, g * g, 3 * p * p).astype(v["patch_embed"].dtype)
        x = x @ v["patch_embed"]  # [N, T, Hv]
        cls = jnp.broadcast_to(v["class_emb"], (N, 1, Hv)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + v["pos_embed"].astype(x.dtype)[None]
        x = _layer_norm(x, v["pre_ln_w"], v["pre_ln_b"])

        act = _quick_gelu if self.v_act == "quick_gelu" else (
            lambda t: jax.nn.gelu(t, approximate=False)
        )
        scale = hd**-0.5

        def block(carry, lp):
            x = carry
            h = _layer_norm(x, lp["ln1_w"], lp["ln1_b"])
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
            h2 = _layer_norm(x, lp["ln2_w"], lp["ln2_b"])
            m = act((h2 @ lp["fc1"] + lp["b1"]).astype(jnp.float32)).astype(
                x.dtype
            )
            return x + (m @ lp["fc2"] + lp["b2"]), None

        eff = max(0, min(self.v_eff_layers, self.v_layers))
        blocks = jax.tree.map(lambda a: a[:eff], v["blocks"])
        x, _ = jax.lax.scan(block, x, blocks)

        if self.v_strategy == "default":
            x = x[:, 1:]  # drop CLS
        pact = _quick_gelu if self.proj_act == "quick_gelu" else (
            lambda t: jax.nn.gelu(t, approximate=False)
        )
        x = pact(
            (x @ v["proj_fc1"] + v["proj_b1"]).astype(jnp.float32)
        ).astype(x.dtype)
        return x @ v["proj_fc2"] + v["proj_b2"]


class PixtralLlavaForCausalLM(LlavaForConditionalGeneration):
    """LLaVA composite with a Pixtral vision tower (reference
    `srt/models/pixtral.py` / HF `PixtralVisionModel`): variable-size
    images, bias-less patch conv, RMSNorm pre/attention/ffn norms, SiLU
    gate/up/down MLP, per-position 2D rope over an image_size/patch grid
    (freqs_h from even, freqs_w from odd frequency rows), block-diagonal
    attention per image, no CLS token and no merge (every patch is one
    placeholder token)."""

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        vc = self.vision_cfg
        self.v_rope_theta = vc.get("rope_theta", 10000.0)
        self.v_maxside = self.v_img // self.v_patch

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        dt = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        Hv, F, L = self.v_hidden, self.v_inter, self.v_layers
        Dt = self.config.hidden_size
        patch_dim = 3 * self.v_patch**2
        shapes["visual"] = {
            "patch_embed": ((patch_dim, Hv), dt),
            "ln_pre": ((Hv,), jnp.float32),
            "blocks": {
                "attn_norm": ((L, Hv), jnp.float32),
                "wq": ((L, Hv, Hv), dt),
                "wk": ((L, Hv, Hv), dt),
                "wv": ((L, Hv, Hv), dt),
                "wo": ((L, Hv, Hv), dt),
                "ffn_norm": ((L, Hv), jnp.float32),
                "w_gate": ((L, Hv, F), dt),
                "w_up": ((L, Hv, F), dt),
                "w_down": ((L, F, Hv), dt),
            },
            "proj_fc1": ((Hv, Dt), dt),
            "proj_b1": ((Dt,), dt),
            "proj_fc2": ((Dt, Dt), dt),
            "proj_b2": ((Dt,), dt),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = LlamaForCausalLM.param_shardings(self)
        specs["visual"] = {
            "patch_embed": P(),
            "ln_pre": P(),
            "blocks": {
                "attn_norm": P(None, None),
                "wq": P(None, None, "model"),
                "wk": P(None, None, "model"),
                "wv": P(None, None, "model"),
                "wo": P(None, "model", None),
                "ffn_norm": P(None, None),
                "w_gate": P(None, None, "model"),
                "w_up": P(None, None, "model"),
                "w_down": P(None, "model", None),
            },
            "proj_fc1": P(None, "model"),
            "proj_b1": P("model"),
            "proj_fc2": P("model", None),
            "proj_b2": P(),
        }
        return specs

    def hf_weight_map(self):
        top, per_layer = LlamaForCausalLM.hf_weight_map(self)
        vis_top = {
            "vision_tower.patch_conv.weight": (
                "visual.patch_embed", "flatten_oc_transpose",
            ),
            "vision_tower.ln_pre.weight": ("visual.ln_pre", None),
            "multi_modal_projector.linear_1.weight": ("visual.proj_fc1", "transpose"),
            "multi_modal_projector.linear_1.bias": ("visual.proj_b1", None),
            "multi_modal_projector.linear_2.weight": ("visual.proj_fc2", "transpose"),
            "multi_modal_projector.linear_2.bias": ("visual.proj_b2", None),
        }
        for k, v in list(vis_top.items()):
            vis_top["model." + k] = v
        top.update(vis_top)
        return top, per_layer

    def hf_block_maps(self):
        m = {
            "attention_norm.weight": ("attn_norm", None),
            "attention.q_proj.weight": ("wq", "transpose"),
            "attention.k_proj.weight": ("wk", "transpose"),
            "attention.v_proj.weight": ("wv", "transpose"),
            "attention.o_proj.weight": ("wo", "transpose"),
            "ffn_norm.weight": ("ffn_norm", None),
            "feed_forward.gate_proj.weight": ("w_gate", "transpose"),
            "feed_forward.up_proj.weight": ("w_up", "transpose"),
            "feed_forward.down_proj.weight": ("w_down", "transpose"),
        }
        return {
            "vision_tower.transformer.layers.": {
                k: (f"visual.blocks.{dst}", tr) for k, (dst, tr) in m.items()
            }
        }

    # ------------------------------------------------------------------
    def compute_vision_embeds(self, params, mm, vision_fn) -> jax.Array:
        pixels = np.asarray(mm["pixel_values"], dtype=np.float32)
        sizes = np.asarray(mm["image_sizes"], dtype=np.int64)
        p = self.v_patch
        rows, segs, poss = [], [], []
        for i, (h, w) in enumerate(sizes):
            gh, gw = int(h) // p, int(w) // p
            img = pixels[i, :, : gh * p, : gw * p]
            # row-major patchify in conv channel order (c, ph, pw)
            x = img.reshape(3, gh, p, gw, p).transpose(1, 3, 0, 2, 4)
            rows.append(x.reshape(gh * gw, 3 * p * p))
            segs.append(np.full(gh * gw, i, dtype=np.int32))
            hh, ww = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
            poss.append((hh * self.v_maxside + ww).reshape(-1).astype(np.int32))
        patches = np.concatenate(rows)
        seg = np.concatenate(segs)
        pos = np.concatenate(poss)
        Pn = patches.shape[0]
        Pb = 1 << (Pn - 1).bit_length() if Pn > 1 else 1
        if Pb != Pn:
            patches = np.pad(patches, ((0, Pb - Pn), (0, 0)))
            seg = np.pad(seg, (0, Pb - Pn), constant_values=-1)
            pos = np.pad(pos, (0, Pb - Pn))
        out = vision_fn(
            params, jnp.asarray(patches), jnp.asarray(seg), jnp.asarray(pos)
        )
        return out[:Pn]

    def vision_forward(self, params, patches, seg, pos) -> jax.Array:
        """patches [P, 3*p*p] (block-diag segments per image), pos [P]
        flat (h*maxside + w) rope indices -> [P, text_hidden]."""
        from sglang_npu_tpu.layers.ops import rms_norm

        v = params["visual"]
        Hv, nh = self.v_hidden, self.v_heads
        hd = self.v_head_dim
        Pn = patches.shape[0]
        x = patches.astype(v["patch_embed"].dtype) @ v["patch_embed"]
        x = rms_norm(x, v["ln_pre"], 1e-5)

        # 2D rope table in HF pixtral's interleave: h rows take the even
        # frequency indices, w columns the odd ones
        ms = self.v_maxside
        freqs = 1.0 / (
            self.v_rope_theta
            ** (np.arange(0, hd, 2, dtype=np.float64) / hd)
        )
        fh = np.outer(np.arange(ms), freqs[::2])
        fw = np.outer(np.arange(ms), freqs[1::2])
        table = np.concatenate(
            [
                np.repeat(fh[:, None, :], ms, axis=1),
                np.repeat(fw[None, :, :], ms, axis=0),
            ],
            axis=-1,
        ).reshape(ms * ms, hd // 2)
        table = np.concatenate([table, table], axis=-1).astype(np.float32)
        emb = jnp.asarray(table)[pos]  # [P, hd]
        cos = jnp.cos(emb)[:, None, :]
        sin = jnp.sin(emb)[:, None, :]

        def rot(t):
            t1, t2 = jnp.split(t, 2, axis=-1)
            return jnp.concatenate([-t2, t1], axis=-1)

        mask = (seg[None, :] == seg[:, None]) & (seg[None, :] >= 0)
        scale = hd**-0.5
        NEG = -1e9

        def block(x, lp):
            h = rms_norm(x, lp["attn_norm"], 1e-5)
            q = (h @ lp["wq"]).reshape(Pn, nh, hd).astype(jnp.float32)
            k = (h @ lp["wk"]).reshape(Pn, nh, hd).astype(jnp.float32)
            vv = (h @ lp["wv"]).reshape(Pn, nh, hd)
            q = (q * cos + rot(q) * sin).astype(x.dtype)
            k = (k * cos + rot(k) * sin).astype(x.dtype)
            s = jnp.einsum(
                "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            s = jnp.where(mask[None], s, NEG)
            pr = jax.nn.softmax(s, axis=-1).astype(vv.dtype)
            o = jnp.einsum(
                "hqk,khd->qhd", pr, vv, preferred_element_type=jnp.float32
            ).astype(x.dtype).reshape(Pn, Hv)
            x = x + o @ lp["wo"]
            h2 = rms_norm(x, lp["ffn_norm"], 1e-5)
            act = jax.nn.silu(
                (h2 @ lp["w_gate"]).astype(jnp.float32)
            ).astype(x.dtype) * (h2 @ lp["w_up"])
            return x + act @ lp["w_down"], None

        x, _ = jax.lax.scan(block, x, v["blocks"])
        pact = _quick_gelu if self.proj_act == "quick_gelu" else (
            lambda t: jax.nn.gelu(t, approximate=False)
        )
        x = pact(
            (x @ v["proj_fc1"] + v["proj_b1"]).astype(jnp.float32)
        ).astype(x.dtype)
        return x @ v["proj_fc2"] + v["proj_b2"]


def LlavaDispatch(config: ModelConfig, attn_backend=None):
    """LlavaForConditionalGeneration covers multiple towers; dispatch on
    the vision config's model_type (reference llava.py does the same via
    its vision tower registry)."""
    vt = config.hf_config.get("vision_config", {}).get("model_type", "clip")
    if vt == "pixtral":
        return PixtralLlavaForCausalLM(config, attn_backend)
    return LlavaForConditionalGeneration(config, attn_backend)
