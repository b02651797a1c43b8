"""BERT-family encoder for embedding / reranker serving.

Counterpart of the reference's `srt/models/bert.py` (BertModel embedding
path used by e5-base-class retrieval models and cross-encoder rerankers):
encoder-only, bidirectional attention, learned absolute position
embeddings, post-LayerNorm blocks.  Serves in ``--is-embedding`` mode:
mean pooling over valid tokens + L2 normalization (the
sentence-transformers convention the reference's EmbeddingBatchResult
path follows).  The KV pool is untouched — encoders recompute per
request (no KV reuse to cache).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.model_executor.forward_batch_info import ForwardBatch

NEG_INF = -1e9


def layer_norm(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class BertEmbeddingModel:
    """BertModel (also covers RobertaModel-shape checkpoints with
    type_vocab_size>=1 and absolute positions)."""

    is_encoder_only = True
    attn_backend = None  # unused; encoder attends in one shot
    # position-embedding row offset: roberta rows start at pad_id + 1
    pos_offset = 0
    hf_prefix = ""  # checkpoint key prefix ("roberta." for *ForSequence...)

    def __init__(self, config: ModelConfig, attn_backend=None):
        self.config = config
        hf = config.hf_config
        self.eps = hf.get("layer_norm_eps", 1e-12)
        self.type_vocab = hf.get("type_vocab_size", 2)
        self.scale = config.head_dim**-0.5

    # ------------------------------------------------------------------
    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, D, F = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        H = c.num_attention_heads
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        return {
            "embed": ((c.vocab_size, D), dt),
            "pos_embed": ((c.max_position_embeddings, D), dt),
            "type_embed": ((self.type_vocab, D), dt),
            "embed_ln_w": ((D,), jnp.float32),
            "embed_ln_b": ((D,), jnp.float32),
            "layers": {
                "wq": ((L, D, D), dt), "bq": ((L, D), dt),
                "wk": ((L, D, D), dt), "bk": ((L, D), dt),
                "wv": ((L, D, D), dt), "bv": ((L, D), dt),
                "wo": ((L, D, D), dt), "bo": ((L, D), dt),
                "attn_ln_w": ((L, D), jnp.float32),
                "attn_ln_b": ((L, D), jnp.float32),
                "w_in": ((L, D, F), dt), "b_in": ((L, F), dt),
                "w_out": ((L, F, D), dt), "b_out": ((L, D), dt),
                "out_ln_w": ((L, D), jnp.float32),
                "out_ln_b": ((L, D), jnp.float32),
            },
        }

    def param_shardings(self) -> Dict[str, Any]:
        lay = {
            "wq": P(None, None, "model"), "bq": P(None, "model"),
            "wk": P(None, None, "model"), "bk": P(None, "model"),
            "wv": P(None, None, "model"), "bv": P(None, "model"),
            "wo": P(None, "model", None), "bo": P(None, None),
            "attn_ln_w": P(None, None), "attn_ln_b": P(None, None),
            "w_in": P(None, None, "model"), "b_in": P(None, "model"),
            "w_out": P(None, "model", None), "b_out": P(None, None),
            "out_ln_w": P(None, None), "out_ln_b": P(None, None),
        }
        return {
            "embed": P(None, "model"),
            "pos_embed": P(None, None),
            "type_embed": P(None, None),
            "embed_ln_w": P(None),
            "embed_ln_b": P(None),
            "layers": lay,
        }

    def hf_weight_map(self):
        pre = self.hf_prefix
        top = {
            pre + "embeddings.word_embeddings.weight": ("embed", None),
            pre + "embeddings.position_embeddings.weight": ("pos_embed", None),
            pre + "embeddings.token_type_embeddings.weight": ("type_embed", None),
            pre + "embeddings.LayerNorm.weight": ("embed_ln_w", None),
            pre + "embeddings.LayerNorm.bias": ("embed_ln_b", None),
        }
        # encoder blocks load via the block-map path ("encoder.layer.{i}.")
        return top, {}

    def hf_block_maps(self):
        per_layer = {}
        for hf_n, dst, tr in (
            ("attention.self.query.weight", "wq", "transpose"),
            ("attention.self.query.bias", "bq", None),
            ("attention.self.key.weight", "wk", "transpose"),
            ("attention.self.key.bias", "bk", None),
            ("attention.self.value.weight", "wv", "transpose"),
            ("attention.self.value.bias", "bv", None),
            ("attention.output.dense.weight", "wo", "transpose"),
            ("attention.output.dense.bias", "bo", None),
            ("attention.output.LayerNorm.weight", "attn_ln_w", None),
            ("attention.output.LayerNorm.bias", "attn_ln_b", None),
            ("intermediate.dense.weight", "w_in", "transpose"),
            ("intermediate.dense.bias", "b_in", None),
            ("output.dense.weight", "w_out", "transpose"),
            ("output.dense.bias", "b_out", None),
            ("output.LayerNorm.weight", "out_ln_w", None),
            ("output.LayerNorm.bias", "out_ln_b", None),
        ):
            per_layer[hf_n] = (f"layers.{dst}", tr)
        return {self.hf_prefix + "encoder.layer.": per_layer}

    # ------------------------------------------------------------------
    def _encode(self, params, fb: ForwardBatch):
        c = self.config
        B, E = fb.input_ids.shape
        H, dh = c.num_attention_heads, c.head_dim
        lens = (
            fb.extend_seq_lens
            if fb.extend_seq_lens is not None
            else jnp.full((B,), E, jnp.int32)
        )
        pos = jnp.arange(E, dtype=jnp.int32)[None, :]
        valid = pos < lens[:, None]  # [B, E]
        x = (
            params["embed"][fb.input_ids]
            + params["pos_embed"][pos + self.pos_offset]
            + params["type_embed"][0][None, None, :]
        )
        x = layer_norm(x, params["embed_ln_w"], params["embed_ln_b"], self.eps)

        # bidirectional mask over the valid region
        amask = (valid[:, None, :] & valid[:, :, None])  # [B, E, E]
        bias = jnp.where(amask, 0.0, NEG_INF)[:, None, :, :]  # [B, 1, E, E]

        def layer_fn(x, lp):
            q = (jnp.einsum("bed,dh->beh", x, lp["wq"]) + lp["bq"]).reshape(
                B, E, H, dh
            )
            k = (jnp.einsum("bed,dh->beh", x, lp["wk"]) + lp["bk"]).reshape(
                B, E, H, dh
            )
            v = (jnp.einsum("bed,dh->beh", x, lp["wv"]) + lp["bv"]).reshape(
                B, E, H, dh
            )
            s = (
                jnp.einsum(
                    "bqhd,bkhd->bhqk", q, k,
                    preferred_element_type=jnp.float32,
                )
                * self.scale
                + bias
            )
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            att = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, E, H * dh)
            att = jnp.einsum("beh,hd->bed", att, lp["wo"]) + lp["bo"]
            x = layer_norm(x + att, lp["attn_ln_w"], lp["attn_ln_b"], self.eps)
            h = jnp.einsum("bed,df->bef", x, lp["w_in"]) + lp["b_in"]
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(
                x.dtype
            )
            h = jnp.einsum("bef,fd->bed", h, lp["w_out"]) + lp["b_out"]
            x = layer_norm(x + h, lp["out_ln_w"], lp["out_ln_b"], self.eps)
            return x, None

        x, _ = jax.lax.scan(layer_fn, x, params["layers"])
        return x, valid

    def embed_forward(self, params, kv_pool, fb: ForwardBatch, page_size: int):
        """Mean-pooled, L2-normalized sentence embeddings [B, D]."""
        x, valid = self._encode(params, fb)
        m = valid[..., None].astype(jnp.float32)
        pooled = (x.astype(jnp.float32) * m).sum(1) / jnp.maximum(
            m.sum(1), 1.0
        )
        normed = pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True).clip(
            1e-9
        )
        return normed, kv_pool

    def forward(self, *a, **k):
        raise ValueError(
            "BERT is encoder-only: serve it with --is-embedding"
        )

    __call__ = forward


class RobertaEmbeddingModel(BertEmbeddingModel):
    """RobertaModel / XLMRobertaModel (reference `srt/models/roberta.py`):
    identical encoder, but position-embedding rows start at pad_id + 1
    (HF `create_position_ids_from_input_ids` for unpadded input)."""

    def __init__(self, config: ModelConfig, attn_backend=None):
        super().__init__(config, attn_backend)
        pad = config.hf_config.get("pad_token_id")
        self.pos_offset = (1 if pad is None else pad) + 1


class RobertaForSequenceClassification(RobertaEmbeddingModel):
    """XLMRobertaForSequenceClassification cross-encoder rerankers
    (reference `srt/models/roberta.py` classification path): encoder +
    first-token (<s>) classification head dense->tanh->out_proj; served
    with --is-embedding, scores returned as the "embedding" vector."""

    hf_prefix = "roberta."

    def param_shapes(self):
        shapes = super().param_shapes()
        D = self.config.hidden_size
        n = self.config.hf_config.get("num_labels", 1)
        dt = jnp.bfloat16 if self.config.dtype == "bfloat16" else jnp.float32
        shapes["cls_dense_w"] = ((D, D), dt)
        shapes["cls_dense_b"] = ((D,), dt)
        shapes["cls_out_w"] = ((D, n), dt)
        shapes["cls_out_b"] = ((n,), dt)
        return shapes

    def param_shardings(self):
        specs = super().param_shardings()
        for k in ("cls_dense_w", "cls_dense_b", "cls_out_w", "cls_out_b"):
            specs[k] = P(*([None] * len(self.param_shapes()[k][0])))
        return specs

    def hf_weight_map(self):
        top, per_layer = super().hf_weight_map()
        top["classifier.dense.weight"] = ("cls_dense_w", "transpose")
        top["classifier.dense.bias"] = ("cls_dense_b", None)
        top["classifier.out_proj.weight"] = ("cls_out_w", "transpose")
        top["classifier.out_proj.bias"] = ("cls_out_b", None)
        return top, per_layer

    def embed_forward(self, params, kv_pool, fb: ForwardBatch, page_size: int):
        x, _valid = self._encode(params, fb)
        first = x[:, 0].astype(jnp.float32)  # <s> token pooling
        h = jnp.tanh(first @ params["cls_dense_w"].astype(jnp.float32)
                     + params["cls_dense_b"].astype(jnp.float32))
        logits = h @ params["cls_out_w"].astype(jnp.float32) + params[
            "cls_out_b"
        ].astype(jnp.float32)
        return logits, kv_pool
