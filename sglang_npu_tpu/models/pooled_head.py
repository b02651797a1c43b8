"""Sequence classification / reward-model heads over decoder trunks.

Counterparts of the reference's `srt/models/llama_classification.py`,
`qwen2_classification.py`, `qwen2_rm.py`, `gemma2_reward.py`,
`internlm2_reward.py`: all of them run the trunk, pool the LAST token's
hidden state (no normalization), and apply a small scoring head —
a single linear for classification, a Linear→ReLU→Linear stack for the
Qwen2 reward model.  Served in ``--is-embedding`` mode: the pooled head
output IS the returned "embedding" vector (scores), exactly like the
reference's `EmbeddingPoolerOutput`.

``make_pooled_head(trunk_cls, head)`` builds a subclass whose
``embed_forward`` replaces the trunk's normalize-last-hidden embedding
path with the scoring head.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _resolve_dim(spec, hf: dict, hidden: int) -> int:
    if isinstance(spec, int):
        return spec
    if spec == "hidden":
        return hidden
    v = hf.get(spec) or hf.get("num_labels")
    if not v and isinstance(hf.get("id2label"), dict):
        # HF serializes num_labels as the id2label mapping
        v = len(hf["id2label"])
    return int(v or 2)


def make_pooled_head(
    trunk_cls,
    head: List[Tuple[str, Any, bool, Optional[str]]],
    name: str,
):
    """head: list of (hf_param_prefix, out_dim_spec, has_bias, activation)
    applied in order to the pooled last-token hidden state."""

    class PooledHeadModel(trunk_cls):
        def param_shapes(self) -> Dict[str, Any]:
            shapes = super().param_shapes()
            shapes.pop("lm_head", None)
            shapes.pop("lm_head_b", None)
            c = self.config
            dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
            d_in = c.hidden_size
            for i, (_, dim_spec, bias, _) in enumerate(head):
                d_out = _resolve_dim(dim_spec, c.hf_config, c.hidden_size)
                shapes[f"head_{i}_w"] = ((d_in, d_out), dt)
                if bias:
                    shapes[f"head_{i}_b"] = ((d_out,), jnp.float32)
                d_in = d_out
            return shapes

        def param_shardings(self) -> Dict[str, Any]:
            specs = super().param_shardings()
            specs.pop("lm_head", None)
            specs.pop("lm_head_b", None)
            for i, (_, _, bias, _) in enumerate(head):
                specs[f"head_{i}_w"] = P(None, None)
                if bias:
                    specs[f"head_{i}_b"] = P(None)
            return specs

        def hf_weight_map(self):
            top, per_layer = super().hf_weight_map()
            top.pop("lm_head.weight", None)
            top.pop("lm_head.bias", None)
            for i, (hf_name, _, bias, _) in enumerate(head):
                top[f"{hf_name}.weight"] = (f"head_{i}_w", "transpose")
                if bias:
                    top[f"{hf_name}.bias"] = (f"head_{i}_b", None)
            return top, per_layer

        def embed_forward(
            self, params, kv_pool, fb, page_size: int
        ):
            """LAST-token pooling + scoring head, NO normalization."""
            h, kv_pool = self.hidden_forward(params, kv_pool, fb, page_size)
            h = h.astype(jnp.float32)
            for i, (_, _, bias, act) in enumerate(head):
                h = h @ params[f"head_{i}_w"].astype(jnp.float32)
                if bias:
                    h = h + params[f"head_{i}_b"]
                if act == "relu":
                    h = jax.nn.relu(h)
            return h, kv_pool

    PooledHeadModel.__name__ = name
    return PooledHeadModel


def _lazy(trunk_module: str, trunk_name: str, head, name: str):
    import importlib

    trunk_cls = getattr(importlib.import_module(trunk_module), trunk_name)
    return make_pooled_head(trunk_cls, head, name)


def LlamaForSequenceClassification(config, attn_backend=None):
    cls = _lazy(
        "sglang_npu_tpu.models.llama", "LlamaForCausalLM",
        [("score", "num_labels", False, None)],
        "LlamaForSequenceClassification",
    )
    return cls(config, attn_backend)


def LlamaForClassification(config, attn_backend=None):
    cls = _lazy(
        "sglang_npu_tpu.models.llama", "LlamaForCausalLM",
        [("classification_head", "classification_out_size", False, None)],
        "LlamaForClassification",
    )
    return cls(config, attn_backend)


def Qwen2ForSequenceClassification(config, attn_backend=None):
    cls = _lazy(
        "sglang_npu_tpu.models.llama", "LlamaForCausalLM",
        [("score", "num_labels", False, None)],
        "Qwen2ForSequenceClassification",
    )
    return cls(config, attn_backend)


def Qwen2ForRewardModel(config, attn_backend=None):
    cls = _lazy(
        "sglang_npu_tpu.models.llama", "LlamaForCausalLM",
        [("score.0", "hidden", True, "relu"), ("score.2", 1, True, None)],
        "Qwen2ForRewardModel",
    )
    return cls(config, attn_backend)


def Gemma2ForSequenceClassification(config, attn_backend=None):
    cls = _lazy(
        "sglang_npu_tpu.models.gemma2", "Gemma2ForCausalLM",
        [("score", "num_labels", False, None)],
        "Gemma2ForSequenceClassification",
    )
    return cls(config, attn_backend)
