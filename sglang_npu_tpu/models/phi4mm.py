"""Phi-4-multimodal (vision + audio over the Phi-3 trunk).

Behavioral counterpart of the reference's `srt/models/phi4mm.py` +
`phi4mm_audio.py` (HF spec `modeling_phi4_multimodal.py`):

  * **Vision**: SigLIP-navit tower — conv patch embed, bucketized
    fractional position ids under partial patch masks (dynamic HD crops),
    biased qkv/o + LayerNorm encoder, feature_layer=-2 features, 2x2
    avg-pool token compression (reflection pad when the grid is odd) —
    then the dynamic-HD reassembly: per image a global crop plus an
    h×w sub-crop grid stitched row-major with learned separator tokens
    (`sub_img_feature_extensor` per row, `global_img_feature_extensor`
    between sub and global), gelu MLP projection into the text width.
  * **Audio**: conformer encoder — mean/variance input norm, NeMo conv
    subsampling (stride-2 conv stack, time_reduction 8), T5-style
    relative attention bias added to a (float-promoted) streaming mask,
    blocks of 0.5*FFN + biased MHA + GLU/depthwise conv module +
    0.5*FFN + LayerNorm, speech vs vision-speech gelu projections.
  * Image tokens and audio tokens are replaced 1:1 by tower rows, in
    prompt order (`Phi4MultimodalFeatureEmbedding`); the audio
    projection switches to the vision-speech pair when images are
    present in the same request.

The decoder trunk is this repo's Phi-3 (fused qkv / gate_up).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.llava import _layer_norm
from sglang_npu_tpu.models.phi3 import Phi3ForCausalLM

NEG_INF = float(np.finfo(np.float32).min)


def _gelu(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False)


def _gelu_tanh(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True)


class Phi4MMForCausalLM(Phi3ForCausalLM):
    is_multimodal = True

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        vc = hf.get("vision_config", {}) or {}
        ac = hf.get("audio_config", {}) or {}
        self.vc, self.ac = vc, ac
        # ---- vision dims
        self.v_hidden = vc.get("hidden_size", 1152)
        self.v_inter = vc.get("intermediate_size", 4304)
        self.v_layers = vc.get("num_hidden_layers", 27)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.v_head_dim = self.v_hidden // self.v_heads
        self.v_patch = vc.get("patch_size", 14)
        self.v_img = vc.get("image_size", 448)
        self.v_crop = vc.get("crop_size", 448)
        self.v_eps = vc.get("layer_norm_eps", 1e-6)
        self.v_grid = self.v_img // self.v_patch
        self.v_feature_layer = vc.get("feature_layer", -2)
        self.image_token_id = vc.get("image_token_id", 200010)
        # ---- audio dims
        self.a_hidden = ac.get("hidden_size", 1024)
        self.a_inter = ac.get("intermediate_size", 1536)
        self.a_heads = ac.get("num_attention_heads", 16)
        self.a_blocks = ac.get("num_blocks", 24)
        self.a_input = ac.get("input_size", 80)
        self.a_kernel = ac.get("kernel_size", 3)
        self.a_ext_pw = ac.get("ext_pw_out_channel", self.a_hidden)
        self.a_dws_out = ac.get(
            "depthwise_separable_out_channel", self.a_hidden
        )
        self.a_dw_mult = ac.get("depthwise_multiplier", 1)
        self.a_nemo_ch = ac.get("nemo_conv_channels", 1024)
        self.a_nemo_final = ac.get("nemo_final_size", 10)
        self.a_time_red = ac.get("time_reduction", 8)
        self.a_bias_max = ac.get("bias_max_distance", 1000)
        self.a_bias_sym = ac.get("bias_symmetric", False)
        self.a_buckets = self.a_bias_max * (1 if self.a_bias_sym else 2)
        self.audio_token_id = ac.get("audio_token_id", 200011)

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        Hv, Fv, Lv = self.v_hidden, self.v_inter, self.v_layers
        D = c.hidden_size
        shapes["visual"] = {
            "patch_embed": ((3 * self.v_patch**2, Hv), dt),
            "patch_bias": ((Hv,), dt),
            "pos_embed": ((self.v_grid**2, Hv), dt),
            "blocks": {
                "ln1_w": ((Lv, Hv), jnp.float32),
                "ln1_b": ((Lv, Hv), jnp.float32),
                "ln2_w": ((Lv, Hv), jnp.float32),
                "ln2_b": ((Lv, Hv), jnp.float32),
                "wq": ((Lv, Hv, Hv), dt),
                "bq": ((Lv, Hv), dt),
                "wk": ((Lv, Hv, Hv), dt),
                "bk": ((Lv, Hv), dt),
                "wv": ((Lv, Hv, Hv), dt),
                "bv": ((Lv, Hv), dt),
                "wo": ((Lv, Hv, Hv), dt),
                "bo": ((Lv, Hv), dt),
                "fc1": ((Lv, Hv, Fv), dt),
                "b1": ((Lv, Fv), dt),
                "fc2": ((Lv, Fv, Hv), dt),
                "b2": ((Lv, Hv), dt),
            },
            "sub_sep": ((Hv,), dt),   # sub_img_feature_extensor
            "glb_sep": ((Hv,), dt),   # global_img_feature_extensor
            "proj_up": ((Hv, D), dt),
            "proj_up_b": ((D,), dt),
            "proj_down": ((D, D), dt),
            "proj_down_b": ((D,), dt),
        }
        Ha, Fa, La = self.a_hidden, self.a_inter, self.a_blocks
        Ca, k = self.a_ext_pw, self.a_kernel
        nemo = {
            "conv0_w": ((self.a_nemo_ch, 1, 3, 3), dt),
            "conv0_b": ((self.a_nemo_ch,), dt),
            "out_w": ((self.a_nemo_ch * self.a_nemo_final, Ha), dt),
            "out_b": ((Ha,), dt),
        }
        n_stages = int(math.log2(self.a_time_red))
        for s in range(1, n_stages):
            nemo[f"dw{s}_w"] = ((self.a_nemo_ch, 1, 3, 3), dt)
            nemo[f"dw{s}_b"] = ((self.a_nemo_ch,), dt)
            nemo[f"pw{s}_w"] = ((self.a_nemo_ch, self.a_nemo_ch, 1, 1), dt)
            nemo[f"pw{s}_b"] = ((self.a_nemo_ch,), dt)
        shapes["audio"] = {
            "mean": ((self.a_input,), jnp.float32),
            "invstd": ((self.a_input,), jnp.float32),
            **nemo,
            "bias_values": ((self.a_buckets, self.a_heads), jnp.float32),
            "blocks": {
                # ffn_in / ffn_out
                "fi_ln_w": ((La, Ha), jnp.float32),
                "fi_ln_b": ((La, Ha), jnp.float32),
                "fi_gu_w": ((La, Ha, 2 * Fa), dt),
                "fi_gu_b": ((La, 2 * Fa), dt),
                "fi_dn_w": ((La, Fa, Ha), dt),
                "fi_dn_b": ((La, Ha), dt),
                "fo_ln_w": ((La, Ha), jnp.float32),
                "fo_ln_b": ((La, Ha), jnp.float32),
                "fo_gu_w": ((La, Ha, 2 * Fa), dt),
                "fo_gu_b": ((La, 2 * Fa), dt),
                "fo_dn_w": ((La, Fa, Ha), dt),
                "fo_dn_b": ((La, Ha), dt),
                # attention
                "att_ln_w": ((La, Ha), jnp.float32),
                "att_ln_b": ((La, Ha), jnp.float32),
                "wq": ((La, Ha, Ha), dt),
                "bq": ((La, Ha), dt),
                "wk": ((La, Ha, Ha), dt),
                "bk": ((La, Ha), dt),
                "wv": ((La, Ha, Ha), dt),
                "bv": ((La, Ha), dt),
                "wo": ((La, Ha, Ha), dt),
                "bo": ((La, Ha), dt),
                # conv module
                "cv_ln_w": ((La, Ha), jnp.float32),
                "cv_ln_b": ((La, Ha), jnp.float32),
                "glu_w": ((La, 2 * Ca, Ha), dt),
                "glu_b": ((La, 2 * Ca), dt),
                "glu_b1": ((La, Ca), dt),
                "glu_b2": ((La, Ca), dt),
                "dw_w": ((La, Ha * self.a_dw_mult, k), dt),
                "dw_b": ((La, Ha * self.a_dw_mult), dt),
                "pw_w": ((La, self.a_dws_out, Ha * self.a_dw_mult), dt),
                "pw_b": ((La, self.a_dws_out), dt),
                "ext_w": ((La, Ca, Ha), dt),
                "ext_b": ((La, Ca), dt),
                # final norm
                "ln_w": ((La, Ha), jnp.float32),
                "ln_b": ((La, Ha), jnp.float32),
            },
            "sp_up_w": ((Ha, D), dt),
            "sp_up_b": ((D,), dt),
            "sp_dn_w": ((D, D), dt),
            "sp_dn_b": ((D,), dt),
            "vs_up_w": ((Ha, D), dt),
            "vs_up_b": ((D,), dt),
            "vs_dn_w": ((D, D), dt),
            "vs_dn_b": ((D,), dt),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()

        def rep(node):
            out = {}
            for k, v in node.items():
                if isinstance(v, dict):
                    out[k] = rep(v)
                else:
                    out[k] = P(*([None] * len(v[0])))
            return out

        shapes = self.param_shapes()
        specs["visual"] = rep(shapes["visual"])
        specs["audio"] = rep(shapes["audio"])
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        vp = "model.embed_tokens_extend.image_embed."
        ip = vp + "img_processor."
        top.update({
            ip + "embeddings.patch_embedding.weight": (
                "visual.patch_embed", "flatten_oc_transpose",
            ),
            ip + "embeddings.patch_embedding.bias": ("visual.patch_bias", None),
            ip + "embeddings.position_embedding.weight": (
                "visual.pos_embed", None,
            ),
            vp + "sub_img_feature_extensor": ("visual.sub_sep", "squeeze"),
            vp + "global_img_feature_extensor": ("visual.glb_sep", "squeeze"),
            vp + "img_projection_up.weight": ("visual.proj_up", "transpose"),
            vp + "img_projection_up.bias": ("visual.proj_up_b", None),
            vp + "img_projection_down.weight": ("visual.proj_down", "transpose"),
            vp + "img_projection_down.bias": ("visual.proj_down_b", None),
        })
        ap = "model.embed_tokens_extend.audio_embed."
        ep = ap + "encoder."
        amap = {
            ep + "encoder_embedding.global_mean": ("audio.mean", None),
            ep + "encoder_embedding.global_invstd": ("audio.invstd", None),
            ep + "embed.conv.0.weight": ("audio.conv0_w", None),
            ep + "embed.conv.0.bias": ("audio.conv0_b", None),
            ep + "embed.out.weight": ("audio.out_w", "transpose"),
            ep + "embed.out.bias": ("audio.out_b", None),
            ep + "relative_attention_bias_layer.bias_values.weight": (
                "audio.bias_values", None,
            ),
            ap + "up_proj_for_speech.weight": ("audio.sp_up_w", "transpose"),
            ap + "up_proj_for_speech.bias": ("audio.sp_up_b", None),
            ap + "down_proj_for_speech.weight": ("audio.sp_dn_w", "transpose"),
            ap + "down_proj_for_speech.bias": ("audio.sp_dn_b", None),
            ap + "up_proj_for_vision_speech.weight": (
                "audio.vs_up_w", "transpose",
            ),
            ap + "up_proj_for_vision_speech.bias": ("audio.vs_up_b", None),
            ap + "down_proj_for_vision_speech.weight": (
                "audio.vs_dn_w", "transpose",
            ),
            ap + "down_proj_for_vision_speech.bias": ("audio.vs_dn_b", None),
        }
        # nemo subsampling extra stages: Sequential indices are
        # [conv0, act, (dw, pw, act)*]: stage s -> dw at 2+3*(s-1), pw at +1
        n_stages = int(math.log2(self.a_time_red))
        for s in range(1, n_stages):
            base = 2 + 3 * (s - 1)
            amap[ep + f"embed.conv.{base}.weight"] = (f"audio.dw{s}_w", None)
            amap[ep + f"embed.conv.{base}.bias"] = (f"audio.dw{s}_b", None)
            amap[ep + f"embed.conv.{base + 1}.weight"] = (
                f"audio.pw{s}_w", None,
            )
            amap[ep + f"embed.conv.{base + 1}.bias"] = (f"audio.pw{s}_b", None)
        top.update(amap)
        return top, per_layer

    def hf_block_maps(self):
        maps = dict(getattr(super(), "hf_block_maps", lambda: {})())
        vis = {
            "layer_norm1.weight": ("ln1_w", None),
            "layer_norm1.bias": ("ln1_b", None),
            "layer_norm2.weight": ("ln2_w", None),
            "layer_norm2.bias": ("ln2_b", None),
            "self_attn.q_proj.weight": ("wq", "transpose"),
            "self_attn.q_proj.bias": ("bq", None),
            "self_attn.k_proj.weight": ("wk", "transpose"),
            "self_attn.k_proj.bias": ("bk", None),
            "self_attn.v_proj.weight": ("wv", "transpose"),
            "self_attn.v_proj.bias": ("bv", None),
            "self_attn.out_proj.weight": ("wo", "transpose"),
            "self_attn.out_proj.bias": ("bo", None),
            "mlp.fc1.weight": ("fc1", "transpose"),
            "mlp.fc1.bias": ("b1", None),
            "mlp.fc2.weight": ("fc2", "transpose"),
            "mlp.fc2.bias": ("b2", None),
        }
        maps[
            "embed_tokens_extend.image_embed.img_processor.encoder.layers."
        ] = {
            hf: (f"visual.blocks.{ours}", tr) for hf, (ours, tr) in vis.items()
        }
        aud = {
            "feed_forward_in.layer_norm.weight": ("fi_ln_w", None),
            "feed_forward_in.layer_norm.bias": ("fi_ln_b", None),
            "feed_forward_in.gate_up_proj.weight": ("fi_gu_w", "transpose"),
            "feed_forward_in.gate_up_proj.bias": ("fi_gu_b", None),
            "feed_forward_in.down_proj.weight": ("fi_dn_w", "transpose"),
            "feed_forward_in.down_proj.bias": ("fi_dn_b", None),
            "feed_forward_out.layer_norm.weight": ("fo_ln_w", None),
            "feed_forward_out.layer_norm.bias": ("fo_ln_b", None),
            "feed_forward_out.gate_up_proj.weight": ("fo_gu_w", "transpose"),
            "feed_forward_out.gate_up_proj.bias": ("fo_gu_b", None),
            "feed_forward_out.down_proj.weight": ("fo_dn_w", "transpose"),
            "feed_forward_out.down_proj.bias": ("fo_dn_b", None),
            "layer_norm_att.weight": ("att_ln_w", None),
            "layer_norm_att.bias": ("att_ln_b", None),
            "self_attn.q_proj.weight": ("wq", "transpose"),
            "self_attn.q_proj.bias": ("bq", None),
            "self_attn.k_proj.weight": ("wk", "transpose"),
            "self_attn.k_proj.bias": ("bk", None),
            "self_attn.v_proj.weight": ("wv", "transpose"),
            "self_attn.v_proj.bias": ("bv", None),
            "self_attn.o_proj.weight": ("wo", "transpose"),
            "self_attn.o_proj.bias": ("bo", None),
            "conv.layer_norm.weight": ("cv_ln_w", None),
            "conv.layer_norm.bias": ("cv_ln_b", None),
            "conv.glu.ext_pw_conv_1d.weight": ("glu_w", "reshape"),
            "conv.glu.ext_pw_conv_1d.bias": ("glu_b", None),
            "conv.glu.b1": ("glu_b1", "squeeze"),
            "conv.glu.b2": ("glu_b2", "squeeze"),
            "conv.dw_sep_conv_1d.dw_conv.weight": ("dw_w", "reshape"),
            "conv.dw_sep_conv_1d.dw_conv.bias": ("dw_b", None),
            "conv.dw_sep_conv_1d.pw_conv.weight": ("pw_w", "reshape"),
            "conv.dw_sep_conv_1d.pw_conv.bias": ("pw_b", None),
            "conv.ext_pw_conv_1d.weight": ("ext_w", "reshape"),
            "conv.ext_pw_conv_1d.bias": ("ext_b", None),
            "layer_norm.weight": ("ln_w", None),
            "layer_norm.bias": ("ln_b", None),
        }
        maps["embed_tokens_extend.audio_embed.encoder.encoders."] = {
            hf: (f"audio.blocks.{ours}", tr) for hf, (ours, tr) in aud.items()
        }
        return maps

    # ------------------------------------------------------------------
    # Vision tower (jitted): pixels [N,3,S,S] + pos ids + patch mask
    # ------------------------------------------------------------------
    def vision_forward(self, params, pixels, pos_ids, patch_mask):
        """[N, 3, S, S] -> [N, (S/p/2)^2, Hv] compressed patch features
        (feature_layer=-2, navit masked attention, 2x2 avg-pool)."""
        v = params["visual"]
        N = pixels.shape[0]
        p, Hv = self.v_patch, self.v_hidden
        nh, hd = self.v_heads, self.v_head_dim
        S = pixels.shape[-1]
        g = S // p
        T = g * g
        x = pixels.reshape(N, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N, T, 3 * p * p).astype(v["patch_embed"].dtype)
        x = x @ v["patch_embed"] + v["patch_bias"]
        x = x + v["pos_embed"][pos_ids].astype(x.dtype)

        # HF quirk reproduced exactly: the vision attention module sets
        # is_causal=True, and Phi4MultimodalVisionModel drops the patch
        # mask when it is all-ones — under the default sdpa path that
        # makes fully-valid crops run CAUSAL attention, while padded
        # crops run bidirectional masked attention.
        causal = jnp.triu(
            jnp.full((T, T), NEG_INF, jnp.float32), k=1
        )[None, None]
        keymask = jnp.where(patch_mask[:, None, None, :], 0.0, NEG_INF)
        add_mask = jnp.where(
            jnp.all(patch_mask),
            jnp.broadcast_to(causal, (N, 1, T, T)),
            jnp.broadcast_to(keymask, (N, 1, T, T)),
        )
        scale = hd**-0.5

        n_run = self.v_layers + 1 + self.v_feature_layer

        def block(carry, lp):
            x = carry
            h = _layer_norm(x, lp["ln1_w"], lp["ln1_b"], self.v_eps)
            q = (h @ lp["wq"] + lp["bq"]).reshape(N, T, nh, hd)
            k = (h @ lp["wk"] + lp["bk"]).reshape(N, T, nh, hd)
            vv = (h @ lp["wv"] + lp["bv"]).reshape(N, T, nh, hd)
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k,
                preferred_element_type=jnp.float32,
            ) * scale + add_mask
            pr = jax.nn.softmax(s, axis=-1).astype(vv.dtype)
            o = jnp.einsum(
                "bhqk,bkhd->bqhd", pr, vv,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype).reshape(N, T, Hv)
            x = x + (o @ lp["wo"] + lp["bo"])
            h2 = _layer_norm(x, lp["ln2_w"], lp["ln2_b"], self.v_eps)
            m = _gelu_tanh(h2 @ lp["fc1"] + lp["b1"]).astype(x.dtype)
            x = x + (m @ lp["fc2"] + lp["b2"])
            return x, None

        blocks = jax.tree_util.tree_map(lambda a: a[:n_run], v["blocks"])
        x, _ = jax.lax.scan(block, x, blocks)

        # token compression: [N, g, g, Hv] avg-pool 2x2 (reflect-pad odd)
        x = x.reshape(N, g, g, Hv)
        if g % 2 != 0:
            x = jnp.pad(
                x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="reflect"
            )
        go = x.shape[1] // 2
        x = x.reshape(N, go, 2, go, 2, Hv).mean(axis=(2, 4))
        return x.reshape(N, go * go, Hv)

    # ------------------------------------------------------------------
    def _navit_pos_ids(self, mask_hw: np.ndarray) -> np.ndarray:
        """HF Phi4MultimodalVisionEmbeddings bucketized position ids for
        one crop's patch mask [gh, gw] (host-side numpy)."""
        side = self.v_grid
        gh, gw = mask_hw.shape
        pos = np.zeros(gh * gw, dtype=np.int64)
        nb_h = int(mask_hw[:, 0].sum())
        nb_w = int(mask_hw[0].sum())
        boundaries = np.arange(1 / side, 1.0, 1 / side)
        frac_h = np.arange(0, 1 - 1e-6, 1 / max(nb_h, 1))
        frac_w = np.arange(0, 1 - 1e-6, 1 / max(nb_w, 1))
        b_h = np.searchsorted(boundaries, frac_h, side="right")
        b_w = np.searchsorted(boundaries, frac_w, side="right")
        ids = (b_h[:, None] * side + b_w).reshape(-1)
        pos[mask_hw.reshape(-1).astype(bool)] = ids[: int(mask_hw.sum())]
        return pos

    def _image_rows(self, params, mm, vision_fn):
        """All images' projected token rows, concatenated in image order
        (HF Phi4MultimodalImageEmbedding reassembly, host-orchestrated)."""
        pix = np.asarray(mm["image_pixel_values"], np.float32)
        B, C_crops = pix.shape[0], pix.shape[1]
        sizes = np.asarray(mm["image_sizes"], np.int64).reshape(-1, 2)
        am = mm.get("image_attention_mask")
        gh = pix.shape[-2] // self.v_patch
        gw = pix.shape[-1] // self.v_patch
        if am is None:
            am = np.ones((B, C_crops, gh, gw), np.float32)
        am = np.asarray(am).astype(bool)
        flat_pix = pix.reshape(-1, *pix.shape[2:])
        flat_am = am.reshape(-1, gh, gw)
        pos = np.stack([self._navit_pos_ids(mk) for mk in flat_am])
        feats = np.asarray(
            vision_fn(
                params,
                jnp.asarray(flat_pix),
                jnp.asarray(pos),
                jnp.asarray(flat_am.reshape(len(flat_am), -1)),
            ),
            np.float32,
        )  # [B*crops, base^2, Hv]
        base = int(math.isqrt(feats.shape[1]))
        Hv = feats.shape[-1]
        feats = feats.reshape(B, C_crops, base * base, Hv)
        v = params["visual"]
        sub_sep = np.asarray(v["sub_sep"], np.float32)
        glb_sep = np.asarray(v["glb_sep"], np.float32)
        outs = []
        for idx in range(B):
            h_r = int(sizes[idx, 0]) // self.v_crop
            w_r = int(sizes[idx, 1]) // self.v_crop
            area = h_r * w_r
            glob = feats[idx, 0].reshape(base, base, Hv)
            glob = np.concatenate(
                [glob, np.tile(sub_sep, (base, 1, 1))], axis=1
            ).reshape(-1, Hv)
            sub = feats[idx, 1 : area + 1]
            sub = (
                sub.reshape(h_r, w_r, base, base, Hv)
                .transpose(0, 2, 1, 3, 4)
                .reshape(h_r * base, w_r * base, Hv)
            )
            m = (
                am[idx, 1 : area + 1, 0::2, 0::2]
                .reshape(h_r, w_r, base, base)
                .transpose(0, 2, 1, 3)
                .reshape(h_r * base, w_r * base)
            )
            uh = int(m[:, 0].sum())
            uw = int(m[0, :].sum())
            sub = sub[:uh, :uw]
            sub = np.concatenate(
                [sub, np.tile(sub_sep, (uh, 1, 1))], axis=1
            ).reshape(-1, Hv)
            outs.append(
                np.concatenate([sub, glb_sep[None], glob], axis=0)
            )
        rows = np.concatenate(outs, axis=0)
        up = np.asarray(v["proj_up"], np.float32)
        upb = np.asarray(v["proj_up_b"], np.float32)
        dn = np.asarray(v["proj_down"], np.float32)
        dnb = np.asarray(v["proj_down_b"], np.float32)
        h = rows @ up + upb
        h = np.asarray(jax.nn.gelu(jnp.asarray(h), approximate=False))
        return h @ dn + dnb

    # ------------------------------------------------------------------
    # Audio tower (jitted)
    # ------------------------------------------------------------------
    def audio_forward(self, params, feats):
        """[B, T, input_size] mel features -> [B, T/time_red, Ha]."""
        a = params["audio"]
        x = (feats.astype(jnp.float32) - a["mean"]) * a["invstd"]
        B = x.shape[0]
        # NeMo conv subsampling
        y = x[:, None]  # [B, 1, T, F]
        dn = ("NCHW", "OIHW", "NCHW")
        y = jax.lax.conv_general_dilated(
            y, a["conv0_w"].astype(jnp.float32), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=dn,
        ) + a["conv0_b"].astype(jnp.float32)[None, :, None, None]
        y = jax.nn.relu(y)
        n_stages = int(math.log2(self.a_time_red))
        for s in range(1, n_stages):
            y = jax.lax.conv_general_dilated(
                y, a[f"dw{s}_w"].astype(jnp.float32), (2, 2),
                [(1, 1), (1, 1)], dimension_numbers=dn,
                feature_group_count=self.a_nemo_ch,
            ) + a[f"dw{s}_b"].astype(jnp.float32)[None, :, None, None]
            y = jax.lax.conv_general_dilated(
                y, a[f"pw{s}_w"].astype(jnp.float32), (1, 1),
                [(0, 0), (0, 0)], dimension_numbers=dn,
            ) + a[f"pw{s}_b"].astype(jnp.float32)[None, :, None, None]
            y = jax.nn.relu(y)
        Td = y.shape[2]
        x = y.transpose(0, 2, 1, 3).reshape(B, Td, -1)
        x = x @ a["out_w"].astype(jnp.float32) + a["out_b"]

        # relative attention bias (+1.0 on every allowed position: HF adds
        # the BOOL full mask to the float bias)
        ctx = jnp.arange(Td)
        rel = ctx[None, :] - ctx[:, None]
        rel = jnp.clip(rel, -self.a_bias_max, self.a_bias_max - 1)
        bias_idx = jnp.abs(rel) if self.a_bias_sym else rel + self.a_buckets // 2
        bias = a["bias_values"][bias_idx]  # [T, T, nh]
        att_bias = bias.transpose(2, 0, 1)[None] + 1.0

        nh = self.a_heads
        hd = self.a_hidden // nh
        scale = hd**-0.5
        eps = 1e-5  # torch LayerNorm default

        def block(carry, lp):
            x = carry

            def mlp(h, p):
                h = _layer_norm(h, lp[p + "_ln_w"], lp[p + "_ln_b"], eps)
                gu = h @ lp[p + "_gu_w"] + lp[p + "_gu_b"]
                up, gate = jnp.split(gu, 2, axis=-1)
                h = up * jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype)
                return h @ lp[p + "_dn_w"] + lp[p + "_dn_b"]

            residual = x + 0.5 * mlp(x, "fi")
            h = _layer_norm(
                residual, lp["att_ln_w"], lp["att_ln_b"], eps
            )
            q = (h @ lp["wq"] + lp["bq"]).reshape(B, Td, nh, hd)
            k = (h @ lp["wk"] + lp["bk"]).reshape(B, Td, nh, hd)
            vv = (h @ lp["wv"] + lp["bv"]).reshape(B, Td, nh, hd)
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k,
                preferred_element_type=jnp.float32,
            ) * scale + att_bias
            pr = jax.nn.softmax(s, axis=-1).astype(vv.dtype)
            o = jnp.einsum(
                "bhqk,bkhd->bqhd", pr, vv,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype).reshape(B, Td, self.a_hidden)
            x = residual + (o @ lp["wo"] + lp["bo"])

            # conv module
            h = _layer_norm(x, lp["cv_ln_w"], lp["cv_ln_b"], eps)
            z = h @ lp["glu_w"].swapaxes(-1, -2) + lp["glu_b"]  # [B,T,2C]
            C = self.a_ext_pw
            z = (z[..., :C] + lp["glu_b1"]) * jax.nn.silu(
                (z[..., C:] + lp["glu_b2"]).astype(jnp.float32)
            ).astype(z.dtype)
            # depthwise conv over time: pad k-1 both sides, trim right
            kk = self.a_kernel
            zz = z.swapaxes(1, 2)  # [B, C, T]
            zz = jax.lax.conv_general_dilated(
                zz, lp["dw_w"].astype(zz.dtype)[:, None, :],
                (1,), [(kk - 1, kk - 1)],
                dimension_numbers=("NCH", "OIH", "NCH"),
                feature_group_count=zz.shape[1],
            ) + lp["dw_b"][None, :, None]
            if kk > 1:
                zz = zz[:, :, : -(kk - 1)]
            zz = zz.swapaxes(1, 2) @ lp["pw_w"].swapaxes(-1, -2) + lp["pw_b"]
            zz = jax.nn.silu(zz.astype(jnp.float32)).astype(zz.dtype)
            zz = zz @ lp["ext_w"].swapaxes(-1, -2) + lp["ext_b"]
            x = x + zz

            x = x + 0.5 * mlp(x, "fo")
            x = _layer_norm(x, lp["ln_w"], lp["ln_b"], eps)
            return x, None

        x, _ = jax.lax.scan(block, x, a["blocks"])
        return x

    def _audio_rows(self, params, mm, has_image):
        feats = np.asarray(mm["audio_input_features"], np.float32)
        sizes = [int(s) for s in np.asarray(mm["audio_embed_sizes"]).reshape(-1)]
        if not hasattr(self, "_audio_fn"):
            self._audio_fn = jax.jit(self.audio_forward)
        enc = np.asarray(self._audio_fn(params, jnp.asarray(feats)), np.float32)
        a = params["audio"]
        pre = "vs" if has_image else "sp"
        up = np.asarray(a[pre + "_up_w"], np.float32)
        upb = np.asarray(a[pre + "_up_b"], np.float32)
        dn = np.asarray(a[pre + "_dn_w"], np.float32)
        dnb = np.asarray(a[pre + "_dn_b"], np.float32)
        h = enc @ up + upb
        h = np.asarray(jax.nn.gelu(jnp.asarray(h), approximate=False))
        h = h @ dn + dnb
        return np.concatenate(
            [h[i, : sizes[i]] for i in range(len(sizes))], axis=0
        )

    # ------------------------------------------------------------------
    def compute_vision_embeds(self, params, mm, vision_fn):
        """Rows replacing the image AND audio placeholder tokens, in
        prompt-position order (`Phi4MultimodalFeatureEmbedding`)."""
        ids = np.asarray(mm["input_ids"])
        has_image = mm.get("image_pixel_values") is not None
        has_audio = mm.get("audio_input_features") is not None
        img_rows = (
            self._image_rows(params, mm, vision_fn) if has_image else None
        )
        aud_rows = (
            self._audio_rows(params, mm, has_image) if has_audio else None
        )
        D = self.config.hidden_size
        order = []
        ii = ai = 0
        for t in ids:
            if t == self.image_token_id and img_rows is not None:
                order.append(img_rows[ii])
                ii += 1
            elif t == self.audio_token_id and aud_rows is not None:
                order.append(aud_rows[ai])
                ai += 1
        if not order:
            return np.zeros((0, D), np.float32)
        return jnp.asarray(np.stack(order))


ENTRY_CLASS = Phi4MMForCausalLM
