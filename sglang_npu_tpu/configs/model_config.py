"""Normalized model configuration.

Counterpart of the reference's `srt/configs/model_config.py` (`ModelConfig`,
`AttentionArch`): reads a HuggingFace `config.json` (local path) or a plain
dict and normalizes the fields the engine needs.
"""

from __future__ import annotations

import dataclasses
import json
import os
from enum import Enum
from typing import Any, Dict, List, Optional


class AttentionArch(Enum):
    MHA = "mha"
    MLA = "mla"


@dataclasses.dataclass
class ModelConfig:
    architectures: List[str]
    model_type: str
    vocab_size: int
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    intermediate_size: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    hidden_act: str = "silu"
    eos_token_ids: tuple = ()
    bos_token_id: Optional[int] = None
    context_length: int = 4096
    dtype: str = "bfloat16"
    attention_arch: AttentionArch = AttentionArch.MHA
    sliding_window: Optional[int] = None
    # MoE
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    num_shared_experts: int = 0
    norm_topk_prob: bool = False
    # Qwen3-style qk norm
    qk_norm: bool = False
    # raw HF dict for model-specific extras
    hf_config: Dict[str, Any] = dataclasses.field(default_factory=dict)

    # MLA (DeepSeek-V2/V3) geometry
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    kv_lora_rank: int = 0
    q_lora_rank: Optional[int] = None

    @classmethod
    def from_hf_dict(
        cls,
        cfg: Dict[str, Any],
        dtype: str = "auto",
        context_length: Optional[int] = None,
    ) -> "ModelConfig":
        for nested in ("language_config", "llm_config"):
            # deepseek-vl2 nests the trunk as "language_config"; kimi-vl /
            # some internvl exports as "llm_config" (reference
            # `srt/configs/deepseekvl2.py`, `kimi_vl.py` normalization)
            if isinstance(cfg.get(nested), dict) and not isinstance(
                cfg.get("text_config"), dict
            ):
                cfg = dict(cfg)
                cfg["text_config"] = cfg.pop(nested)
        if (
            cfg.get("model_type") in ("chatglm", "glm") or "multi_query_group_num" in cfg
        ) and "seq_length" in cfg:
            # ChatGLM-family field names (reference `srt/configs/chatglm.py`)
            cfg = dict(cfg)
            cfg.setdefault("num_hidden_layers", cfg.get("num_layers"))
            cfg.setdefault("intermediate_size", cfg.get("ffn_hidden_size"))
            cfg.setdefault("max_position_embeddings", cfg.get("seq_length"))
            cfg.setdefault("vocab_size", cfg.get("padded_vocab_size"))
            if cfg.get("multi_query_attention"):
                cfg.setdefault(
                    "num_key_value_heads", cfg.get("multi_query_group_num")
                )
            cfg.setdefault("rms_norm_eps", cfg.get("layernorm_epsilon", 1e-5))
        if isinstance(cfg.get("text_config"), dict):
            # composite VLM configs (qwen2.5-vl, gemma3-mm): flatten the
            # text sub-config; top-level keys (vision_config, image token
            # ids, architectures) win when set
            merged = dict(cfg)
            for k, v in cfg["text_config"].items():
                if merged.get(k) is None:
                    merged[k] = v
            # LM-semantics keys belong to the text sub-config even when the
            # composite carries a (PretrainedConfig-default) top-level value
            # (llava: top-level tie_word_embeddings=True vs llama False)
            for k in ("tie_word_embeddings",):
                if k in cfg["text_config"]:
                    merged[k] = cfg["text_config"][k]
            merged.pop("text_config", None)
            cfg = merged
        if "d_model" in cfg and "attn_config" in cfg:
            # DBRX field names (nested attn/ffn sub-configs)
            cfg = dict(cfg)
            ac = cfg.get("attn_config") or {}
            fc = cfg.get("ffn_config") or {}
            if not isinstance(ac, dict):
                ac = ac.to_dict()
            if not isinstance(fc, dict):
                fc = fc.to_dict()
            cfg.setdefault("hidden_size", cfg["d_model"])
            cfg.setdefault("num_hidden_layers", cfg["n_layers"])
            cfg.setdefault("num_attention_heads", cfg["n_heads"])
            cfg.setdefault("max_position_embeddings", cfg.get("max_seq_len", 4096))
            cfg.setdefault("num_key_value_heads", ac.get("kv_n_heads", cfg["n_heads"]))
            cfg.setdefault("rope_theta", ac.get("rope_theta", 10000.0))
            cfg.setdefault("intermediate_size", fc.get("ffn_hidden_size", 4 * cfg["d_model"]))
            cfg.setdefault("num_experts", fc.get("moe_num_experts", 0))
            cfg.setdefault("num_experts_per_tok", fc.get("moe_top_k", 0))
        if "n_embd" in cfg:
            # GPT-2-family field names (gpt2, gpt_bigcode)
            cfg = dict(cfg)
            cfg.setdefault("hidden_size", cfg["n_embd"])
            cfg.setdefault("num_hidden_layers", cfg["n_layer"])
            cfg.setdefault("num_attention_heads", cfg["n_head"])
            cfg.setdefault(
                "max_position_embeddings", cfg.get("n_positions", 1024)
            )
            inner = cfg.get("n_inner")
            cfg.setdefault(
                "intermediate_size", inner if inner else 4 * cfg["n_embd"]
            )
            cfg.setdefault("rms_norm_eps", cfg.get("layer_norm_epsilon", 1e-5))
            if cfg.get("multi_query"):
                cfg.setdefault("num_key_value_heads", 1)
        if "num_hidden_layers" not in cfg and "num_layers" in cfg:
            # exaone-v1 / chatglm spell it num_layers
            cfg = dict(cfg)
            cfg["num_hidden_layers"] = cfg["num_layers"]
        if "rms_norm_eps" not in cfg and "layer_norm_epsilon" in cfg:
            # qwen-v1 / exaone-v1 RMSNorm eps name
            cfg = dict(cfg)
            cfg["rms_norm_eps"] = cfg["layer_norm_epsilon"]
        heads = cfg["num_attention_heads"]
        kv_heads = cfg.get("num_key_value_heads", heads)
        head_dim = cfg.get("head_dim") or cfg["hidden_size"] // heads
        if cfg.get("kv_lora_rank"):
            # MLA: cache geometry is MHA-expanded for now (see deepseek_v2)
            head_dim = cfg["qk_nope_head_dim"] + cfg["qk_rope_head_dim"]
            kv_heads = heads
        eos = cfg.get("eos_token_id", [])
        if eos is None:
            eos = []
        if isinstance(eos, int):
            eos = [eos]
        max_pos = cfg.get("max_position_embeddings", 4096)
        model_type = cfg.get("model_type", "llama")
        if dtype == "auto":
            torch_dtype = str(cfg.get("torch_dtype", "bfloat16"))
            dtype = "bfloat16" if "bfloat16" in torch_dtype else (
                "float32" if "float32" in torch_dtype else "bfloat16"
            )
        return cls(
            architectures=cfg.get("architectures") or ["LlamaForCausalLM"],
            model_type=model_type,
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=kv_heads,
            head_dim=head_dim,
            intermediate_size=cfg.get("intermediate_size", 4 * cfg["hidden_size"]),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=cfg.get("rope_scaling"),
            max_position_embeddings=max_pos,
            tie_word_embeddings=cfg.get(
                "tie_word_embeddings",
                # HF omits default-valued keys from config.json; these
                # families default to tied heads
                model_type in (
                    "starcoder2", "gemma", "gemma2", "gemma3", "smollm3",
                    "gpt2", "gpt_bigcode", "cohere",
                ),
            ),
            attention_bias=cfg.get(
                "attention_bias",
                cfg.get(  # starcoder2 spells it use_bias
                    "use_bias",
                    model_type
                    in ("qwen2", "qwen2_5_vl", "qwen2_5_vl_text", "phi"),
                ),
            ),
            hidden_act=cfg.get("hidden_act", "silu"),
            eos_token_ids=tuple(eos),
            bos_token_id=cfg.get("bos_token_id"),
            context_length=context_length or max_pos,
            dtype=dtype,
            sliding_window=cfg.get("sliding_window")
            if cfg.get("use_sliding_window", True)
            else None,
            num_experts=cfg.get("num_experts", cfg.get("n_routed_experts", 0)) or 0,
            num_experts_per_tok=cfg.get("num_experts_per_tok", 0) or 0,
            moe_intermediate_size=cfg.get("moe_intermediate_size", 0) or 0,
            num_shared_experts=cfg.get("shared_expert_intermediate_size", 0) or 0,
            qk_norm=model_type in ("qwen3", "qwen3_moe"),
            qk_nope_head_dim=cfg.get("qk_nope_head_dim", 0) or 0,
            qk_rope_head_dim=cfg.get("qk_rope_head_dim", 0) or 0,
            v_head_dim=cfg.get("v_head_dim", 0) or 0,
            kv_lora_rank=cfg.get("kv_lora_rank", 0) or 0,
            q_lora_rank=cfg.get("q_lora_rank"),
            attention_arch=(
                AttentionArch.MLA if cfg.get("kv_lora_rank") else AttentionArch.MHA
            ),
            hf_config=cfg,
        )

    @classmethod
    def from_model_path(
        cls,
        model_path: str,
        dtype: str = "auto",
        context_length: Optional[int] = None,
        json_override: str = "{}",
    ) -> "ModelConfig":
        if model_path.endswith(".gguf"):
            # single-file GGUF checkpoint: the HF config synthesizes from
            # the container metadata (model_loader/gguf_loader.py)
            from sglang_npu_tpu.model_loader.gguf_loader import (
                gguf_to_hf_config,
                read_gguf,
            )

            meta, tensors = read_gguf(model_path)
            cfg = gguf_to_hf_config(meta, tensor_names=set(tensors))
        else:
            cfg_path = os.path.join(model_path, "config.json")
            with open(cfg_path) as f:
                cfg = json.load(f)
        override = json.loads(json_override) if json_override else {}
        cfg.update(override)
        return cls.from_hf_dict(cfg, dtype=dtype, context_length=context_length)

    # ------------------------------------------------------------------
    @property
    def num_qo_heads(self) -> int:
        return self.num_attention_heads

    @property
    def is_mla(self) -> bool:
        return self.attention_arch == AttentionArch.MLA

    @property
    def swa_layers(self) -> Optional[List[bool]]:
        """Per-layer sliding-window flags (True = windowed), or None when
        the model has no sliding-window attention.

        Sources, in priority order (reference `model_config.py` /
        per-model configs):
          * explicit HF ``layer_types`` list ("sliding_attention" entries)
          * gemma2: even layers windowed (HF ``not bool(layer_idx % 2)``)
          * gemma3: ``sliding_window_pattern`` N -> every N-th layer is
            full attention, the rest windowed
          * otherwise (mistral-style global ``sliding_window``): all layers
        """
        if not self.sliding_window:
            return None
        L = self.num_hidden_layers
        lt = self.hf_config.get("layer_types")
        if isinstance(lt, list) and len(lt) == L:
            return [t == "sliding_attention" for t in lt]
        if self.model_type == "gemma2":
            return [l % 2 == 0 for l in range(L)]
        pat = self.hf_config.get("sliding_window_pattern")
        if pat:
            return [(l + 1) % pat != 0 for l in range(L)]
        return [True] * L

    @property
    def swa_uniform(self) -> bool:
        """True when every layer uses the same (windowed) attention."""
        sl = self.swa_layers
        return sl is not None and all(sl)

    def kv_bytes_per_token(self, kv_dtype_bytes: int = 2) -> int:
        if self.is_mla:
            # latent cache: kv_lora_rank + rope dims (padded to one
            # 128-lane tile), shared across heads — see ops/mla_attention.
            # Quantized (1-byte) pools keep the kpe row in bf16 (it also
            # carries the per-row ckv scale in its pad lane).
            from sglang_npu_tpu.ops.mla_attention import KPE_PAD

            kpe_bytes = 2 if kv_dtype_bytes == 1 else kv_dtype_bytes
            return self.num_hidden_layers * (
                self.kv_lora_rank * kv_dtype_bytes + KPE_PAD * kpe_bytes
            )
        return (
            2
            * self.num_hidden_layers
            * self.num_key_value_heads
            * self.head_dim
            * kv_dtype_bytes
        )
