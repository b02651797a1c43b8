"""Qwen2-Audio: Whisper-style audio encoder + Qwen2 LM.

Behavioral counterpart of the reference's `srt/models/qwen2_audio.py`
(HF `Qwen2AudioForConditionalGeneration`): log-mel features run through
two GELU convs (the second stride-2), learned positions, pre-LN
bidirectional transformer layers (k_proj has no bias), a stride-2 average
pool, final LayerNorm and a single linear projector into the text hidden
size.  Each audio contributes `audio_output_lengths[i]` embedding rows,
spliced at its pre-expanded placeholder tokens via the generic
`fb.input_embeds` path (the payload's `image_token_id` carries the audio
placeholder id — the splice plumbing is modality-agnostic).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.models.bert import layer_norm
from sglang_npu_tpu.models.llama import LlamaForCausalLM

NEG_INF = -1e9


def audio_out_lengths(mel_lens: np.ndarray):
    """(post-conv frame lengths, post-pool token lengths) — HF
    `_get_feat_extract_output_lengths`."""
    feat = (np.asarray(mel_lens) - 1) // 2 + 1
    out = (feat - 2) // 2 + 1
    return feat, out


class Qwen2AudioForCausalLM(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        hf = config.hf_config
        ac = hf.get("audio_config", {})
        self.audio_cfg = ac
        self.a_d = ac.get("d_model", 1280)
        self.a_layers = ac.get("encoder_layers", 32)
        self.a_heads = ac.get("encoder_attention_heads", 20)
        self.a_head_dim = self.a_d // self.a_heads
        self.a_ffn = ac.get("encoder_ffn_dim", 5120)
        self.a_mel = ac.get("num_mel_bins", 128)
        self.a_maxpos = ac.get("max_source_positions", 1500)
        self.audio_token_id = hf.get("audio_token_id") or hf.get(
            "audio_token_index"
        )

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        dt = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        d, F, L = self.a_d, self.a_ffn, self.a_layers
        Dt = self.config.hidden_size
        shapes["audio"] = {
            "conv1_w": ((d, self.a_mel, 3), dt),
            "conv1_b": ((d,), dt),
            "conv2_w": ((d, d, 3), dt),
            "conv2_b": ((d,), dt),
            "pos_embed": ((self.a_maxpos, d), dt),
            "blocks": {
                "ln1_w": ((L, d), jnp.float32),
                "ln1_b": ((L, d), jnp.float32),
                "wq": ((L, d, d), dt), "bq": ((L, d), dt),
                "wk": ((L, d, d), dt),  # no k bias (whisper convention)
                "wv": ((L, d, d), dt), "bv": ((L, d), dt),
                "wo": ((L, d, d), dt), "bo": ((L, d), dt),
                "ln2_w": ((L, d), jnp.float32),
                "ln2_b": ((L, d), jnp.float32),
                "fc1": ((L, d, F), dt), "b1": ((L, F), dt),
                "fc2": ((L, F, d), dt), "b2": ((L, d), dt),
            },
            "ln_w": ((d,), jnp.float32),
            "ln_b": ((d,), jnp.float32),
            "proj_w": ((d, Dt), dt),
            "proj_b": ((Dt,), dt),
        }
        return shapes

    def param_shardings(self) -> Dict[str, Any]:
        specs = super().param_shardings()
        specs["audio"] = {
            "conv1_w": P(), "conv1_b": P(),
            "conv2_w": P(), "conv2_b": P(),
            "pos_embed": P(),
            "blocks": {
                "ln1_w": P(None, None), "ln1_b": P(None, None),
                "wq": P(None, None, "model"), "bq": P(None, "model"),
                "wk": P(None, None, "model"),
                "wv": P(None, None, "model"), "bv": P(None, "model"),
                "wo": P(None, "model", None), "bo": P(None, None),
                "ln2_w": P(None, None), "ln2_b": P(None, None),
                "fc1": P(None, None, "model"), "b1": P(None, "model"),
                "fc2": P(None, "model", None), "b2": P(None, None),
            },
            "ln_w": P(), "ln_b": P(),
            "proj_w": P(), "proj_b": P(),
        }
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        pre = "audio_tower."
        atop = {
            pre + "conv1.weight": ("audio.conv1_w", None),
            pre + "conv1.bias": ("audio.conv1_b", None),
            pre + "conv2.weight": ("audio.conv2_w", None),
            pre + "conv2.bias": ("audio.conv2_b", None),
            pre + "embed_positions.weight": ("audio.pos_embed", None),
            pre + "layer_norm.weight": ("audio.ln_w", None),
            pre + "layer_norm.bias": ("audio.ln_b", None),
            "multi_modal_projector.linear.weight": ("audio.proj_w", "transpose"),
            "multi_modal_projector.linear.bias": ("audio.proj_b", None),
        }
        for k, v in list(atop.items()):
            atop["model." + k] = v
        top.update(atop)
        return top, per_layer

    def hf_block_maps(self):
        m = {
            "self_attn_layer_norm.weight": ("ln1_w", None),
            "self_attn_layer_norm.bias": ("ln1_b", None),
            "self_attn.q_proj.weight": ("wq", "transpose"),
            "self_attn.q_proj.bias": ("bq", None),
            "self_attn.k_proj.weight": ("wk", "transpose"),
            "self_attn.v_proj.weight": ("wv", "transpose"),
            "self_attn.v_proj.bias": ("bv", None),
            "self_attn.out_proj.weight": ("wo", "transpose"),
            "self_attn.out_proj.bias": ("bo", None),
            "final_layer_norm.weight": ("ln2_w", None),
            "final_layer_norm.bias": ("ln2_b", None),
            "fc1.weight": ("fc1", "transpose"),
            "fc1.bias": ("b1", None),
            "fc2.weight": ("fc2", "transpose"),
            "fc2.bias": ("b2", None),
        }
        return {
            "audio_tower.layers.": {
                k: (f"audio.blocks.{dst}", tr) for k, (dst, tr) in m.items()
            }
        }

    # ------------------------------------------------------------------
    def compute_vision_embeds(self, params, mm, vision_fn) -> jax.Array:
        """Audio variant of the generic mm-embed hook: returns the flat
        [sum(out_lens), text_hidden] rows in prompt placeholder order."""
        feats = np.asarray(mm["input_features"], dtype=np.float32)
        fam = np.asarray(mm["feature_attention_mask"])
        feat_lens, out_lens = audio_out_lengths(fam.sum(-1))
        N = feats.shape[0]
        Nb = 1 << (N - 1).bit_length() if N > 1 else 1
        if Nb != N:
            feats = np.pad(feats, ((0, Nb - N), (0, 0), (0, 0)))
            feat_lens = np.pad(feat_lens, (0, Nb - N))
        out = vision_fn(
            params, jnp.asarray(feats), jnp.asarray(feat_lens.astype(np.int32))
        )  # [Nb, T_out, Dt]
        rows = [out[i, : int(out_lens[i])] for i in range(N)]
        return jnp.concatenate(rows, axis=0)

    def vision_forward(self, params, feats: jax.Array, feat_lens: jax.Array):
        """Whisper-style encoder + projector.  feats [N, mel, T_mel],
        feat_lens [N] = valid POST-CONV frames; returns [N, T_out, Dt]."""
        a = params["audio"]
        d, nh, hd = self.a_d, self.a_heads, self.a_head_dim
        dn = ("NCH", "OIH", "NCH")
        x = jax.lax.conv_general_dilated(
            feats.astype(a["conv1_w"].dtype), a["conv1_w"], (1,), [(1, 1)],
            dimension_numbers=dn,
        ) + a["conv1_b"][None, :, None]
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
        x = jax.lax.conv_general_dilated(
            x, a["conv2_w"], (2,), [(1, 1)], dimension_numbers=dn
        ) + a["conv2_b"][None, :, None]
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
        x = x.transpose(0, 2, 1)  # [N, T, d]
        N, T, _ = x.shape
        x = x + a["pos_embed"][:T][None].astype(x.dtype)

        valid = jnp.arange(T)[None, :] < feat_lens[:, None]  # [N, T]
        bias = jnp.where(valid, 0.0, NEG_INF)[:, None, None, :]  # [N,1,1,T]
        scale = hd**-0.5
        eps = 1e-5

        def block(carry, lp):
            x = carry
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps)
            q = (h @ lp["wq"] + lp["bq"]).reshape(N, T, nh, hd)
            k = (h @ lp["wk"]).reshape(N, T, nh, hd)
            v = (h @ lp["wv"] + lp["bv"]).reshape(N, T, nh, hd)
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale + bias
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            o = jnp.einsum(
                "bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32
            ).astype(x.dtype).reshape(N, T, d)
            x = x + (o @ lp["wo"] + lp["bo"])
            h2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"], eps)
            m = jax.nn.gelu(
                (h2 @ lp["fc1"] + lp["b1"]).astype(jnp.float32),
                approximate=False,
            ).astype(x.dtype)
            return x + (m @ lp["fc2"] + lp["b2"]), None

        x, _ = jax.lax.scan(block, x, a["blocks"])
        # stride-2 average pool over frames, then final LN + projector
        Tp = (T // 2) * 2  # AvgPool1d(2,2) drops a trailing odd frame
        x = (x[:, 0:Tp:2] + x[:, 1:Tp:2]) * 0.5  # [N, T//2, d]
        x = layer_norm(x, a["ln_w"], a["ln_b"], eps)
        return x @ a["proj_w"] + a["proj_b"]


ENTRY_CLASS = Qwen2AudioForCausalLM
