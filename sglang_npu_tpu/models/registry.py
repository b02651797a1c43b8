"""Model architecture registry (reference `srt/models/registry.py`)."""

from __future__ import annotations

import importlib
import logging
from typing import Dict, Tuple

logger = logging.getLogger(__name__)

# architecture name (HF `architectures[0]`) -> (module, class)
_REGISTRY: Dict[str, Tuple[str, str]] = {
    "LlamaForCausalLM": ("sglang_npu_tpu.models.llama", "LlamaForCausalLM"),
    "MistralForCausalLM": ("sglang_npu_tpu.models.llama", "LlamaForCausalLM"),
    "Qwen2ForCausalLM": ("sglang_npu_tpu.models.llama", "LlamaForCausalLM"),
    "Qwen3ForCausalLM": ("sglang_npu_tpu.models.llama", "LlamaForCausalLM"),
    "Qwen2MoeForCausalLM": ("sglang_npu_tpu.models.qwen_moe", "QwenMoeForCausalLM"),
    "Qwen3MoeForCausalLM": ("sglang_npu_tpu.models.qwen_moe", "QwenMoeForCausalLM"),
    "MixtralForCausalLM": ("sglang_npu_tpu.models.qwen_moe", "QwenMoeForCausalLM"),
    "Gemma2ForCausalLM": ("sglang_npu_tpu.models.gemma2", "Gemma2ForCausalLM"),
    "Gemma3ForCausalLM": ("sglang_npu_tpu.models.gemma3", "Gemma3ForCausalLM"),
    "Gemma3nForCausalLM": ("sglang_npu_tpu.models.gemma3n", "Gemma3nForCausalLM"),
    "Gemma3TextModel": ("sglang_npu_tpu.models.gemma3", "Gemma3ForCausalLM"),
    "Qwen2_5_VLForConditionalGeneration": (
        "sglang_npu_tpu.models.qwen2_5_vl", "Qwen2_5_VLForCausalLM",
    ),
    "Qwen2VLForConditionalGeneration": (
        "sglang_npu_tpu.models.qwen2_vl", "Qwen2VLForCausalLM",
    ),
    "Qwen2AudioForConditionalGeneration": (
        "sglang_npu_tpu.models.qwen2_audio", "Qwen2AudioForCausalLM",
    ),
    "MllamaForConditionalGeneration": (
        "sglang_npu_tpu.models.mllama", "MllamaForCausalLM",
    ),
    "LlavaForConditionalGeneration": (
        "sglang_npu_tpu.models.llava", "LlavaDispatch",
    ),
    "LlavaLlamaForCausalLM": (
        "sglang_npu_tpu.models.llava", "LlavaDispatch",
    ),
    "Gemma3ForConditionalGeneration": (
        "sglang_npu_tpu.models.gemma3_mm", "Gemma3ForConditionalGeneration",
    ),
    "InternVLForConditionalGeneration": (
        "sglang_npu_tpu.models.internvl", "InternVLForCausalLM",
    ),
    "Llama4ForConditionalGeneration": (
        "sglang_npu_tpu.models.llama4_mm", "Llama4VLForConditionalGeneration",
    ),
    "Phi4MultimodalForCausalLM": (
        "sglang_npu_tpu.models.phi4mm", "Phi4MMForCausalLM",
    ),
    "DeepseekV2ForCausalLM": ("sglang_npu_tpu.models.deepseek_v2", "DeepseekV2ForCausalLM"),
    "DeepseekV3ForCausalLM": ("sglang_npu_tpu.models.deepseek_v2", "DeepseekV2ForCausalLM"),
    "Glm4ForCausalLM": ("sglang_npu_tpu.models.glm4", "Glm4ForCausalLM"),
    "GlmForCausalLM": ("sglang_npu_tpu.models.glm4", "Glm4MoeForCausalLM"),
    "Glm4MoeForCausalLM": ("sglang_npu_tpu.models.glm4", "Glm4MoeForCausalLM"),
    "Phi3ForCausalLM": ("sglang_npu_tpu.models.phi3", "Phi3ForCausalLM"),
    "GraniteForCausalLM": ("sglang_npu_tpu.models.granite", "GraniteForCausalLM"),
    "Olmo2ForCausalLM": ("sglang_npu_tpu.models.olmo2", "Olmo2ForCausalLM"),
    "Starcoder2ForCausalLM": ("sglang_npu_tpu.models.starcoder2", "Starcoder2ForCausalLM"),
    "GptOssForCausalLM": ("sglang_npu_tpu.models.gpt_oss", "GptOssForCausalLM"),
    "GPT2LMHeadModel": ("sglang_npu_tpu.models.gpt2", "GPT2LMHeadModel"),
    "GPTBigCodeForCausalLM": ("sglang_npu_tpu.models.gpt2", "GPTBigCodeForCausalLM"),
    "GraniteMoeForCausalLM": ("sglang_npu_tpu.models.granitemoe", "GraniteMoeForCausalLM"),
    "HunYuanDenseV1ForCausalLM": ("sglang_npu_tpu.models.hunyuan", "HunYuanDenseV1ForCausalLM"),
    "Exaone4ForCausalLM": ("sglang_npu_tpu.models.exaone4", "Exaone4ForCausalLM"),
    "PersimmonForCausalLM": ("sglang_npu_tpu.models.persimmon", "PersimmonForCausalLM"),
    "DbrxForCausalLM": ("sglang_npu_tpu.models.dbrx", "DbrxForCausalLM"),
    "PhimoeForCausalLM": ("sglang_npu_tpu.models.phimoe", "PhimoeForCausalLM"),
    "OlmoForCausalLM": ("sglang_npu_tpu.models.olmo", "OlmoForCausalLM"),
    "ArceeForCausalLM": ("sglang_npu_tpu.models.arcee", "ArceeForCausalLM"),
    "StableLmForCausalLM": ("sglang_npu_tpu.models.stablelm", "StableLmForCausalLM"),
    "OlmoeForCausalLM": ("sglang_npu_tpu.models.olmoe", "OlmoeForCausalLM"),
    "CohereForCausalLM": ("sglang_npu_tpu.models.commandr", "CohereForCausalLM"),
    "PhiForCausalLM": ("sglang_npu_tpu.models.phi", "PhiForCausalLM"),
    "Llama4ForCausalLM": ("sglang_npu_tpu.models.llama4", "Llama4ForCausalLM"),
    "SmolLM3ForCausalLM": ("sglang_npu_tpu.models.smollm3", "SmolLM3ForCausalLM"),
    "LlamaForSequenceClassification": ("sglang_npu_tpu.models.pooled_head", "LlamaForSequenceClassification"),
    "LlamaForClassification": ("sglang_npu_tpu.models.pooled_head", "LlamaForClassification"),
    "Qwen2ForSequenceClassification": ("sglang_npu_tpu.models.pooled_head", "Qwen2ForSequenceClassification"),
    "Qwen2ForRewardModel": ("sglang_npu_tpu.models.pooled_head", "Qwen2ForRewardModel"),
    "Gemma2ForSequenceClassification": ("sglang_npu_tpu.models.pooled_head", "Gemma2ForSequenceClassification"),
    "BertModel": ("sglang_npu_tpu.models.bert", "BertEmbeddingModel"),
    "BertForMaskedLM": ("sglang_npu_tpu.models.bert", "BertEmbeddingModel"),
    "RobertaModel": ("sglang_npu_tpu.models.bert", "RobertaEmbeddingModel"),
    "XLMRobertaModel": ("sglang_npu_tpu.models.bert", "RobertaEmbeddingModel"),
    "RobertaForSequenceClassification": ("sglang_npu_tpu.models.bert", "RobertaForSequenceClassification"),
    "XLMRobertaForSequenceClassification": ("sglang_npu_tpu.models.bert", "RobertaForSequenceClassification"),
    "GemmaForCausalLM": ("sglang_npu_tpu.models.gemma", "GemmaForCausalLM"),
    # legacy text trunks (round-5 sweep; reference srt/models/<name>.py)
    "XverseForCausalLM": ("sglang_npu_tpu.models.llama", "LlamaForCausalLM"),
    "MiniCPMForCausalLM": ("sglang_npu_tpu.models.minicpm", "MiniCPMForCausalLM"),
    "ExaoneForCausalLM": ("sglang_npu_tpu.models.exaone", "ExaoneForCausalLM"),
    "BaichuanForCausalLM": ("sglang_npu_tpu.models.baichuan", "BaichuanForCausalLM"),
    "BaiChuanForCausalLM": ("sglang_npu_tpu.models.baichuan", "BaichuanForCausalLM"),
    "InternLM2ForCausalLM": ("sglang_npu_tpu.models.internlm2", "InternLM2ForCausalLM"),
    "InternLM2ForRewardModel": ("sglang_npu_tpu.models.internlm2", "InternLM2ForRewardModel"),
    "InternLMForCausalLM": ("sglang_npu_tpu.models.llama", "LlamaForCausalLM"),
    "QWenLMHeadModel": ("sglang_npu_tpu.models.qwen_v1", "QWenLMHeadModel"),
    "ChatGLMModel": ("sglang_npu_tpu.models.chatglm", "ChatGLMForCausalLM"),
    "ChatGLMForCausalLM": ("sglang_npu_tpu.models.chatglm", "ChatGLMForCausalLM"),
    "ChatGLMForConditionalGeneration": (
        "sglang_npu_tpu.models.chatglm", "ChatGLMForCausalLM",
    ),
    "DeepseekForCausalLM": (
        "sglang_npu_tpu.models.deepseek_v1", "DeepseekV1ForCausalLM",
    ),
    "XverseMoeForCausalLM": (
        "sglang_npu_tpu.models.xverse_moe", "XverseMoeForCausalLM",
    ),
    "MiMoForCausalLM": ("sglang_npu_tpu.models.mimo", "MiMoForCausalLM"),
    "MiMoMTP": ("sglang_npu_tpu.models.mimo", "MiMoMTPModel"),
    "MiniCPM3ForCausalLM": (
        "sglang_npu_tpu.models.minicpm3", "MiniCPM3ForCausalLM",
    ),
    "Grok1ForCausalLM": ("sglang_npu_tpu.models.grok", "Grok1ForCausalLM"),
    "Grok1ModelForCausalLM": (
        "sglang_npu_tpu.models.grok", "Grok1ForCausalLM",
    ),
    "DeepseekVL2ForCausalLM": (
        "sglang_npu_tpu.models.deepseek_vl2", "DeepseekVL2ForCausalLM",
    ),
    "KimiVLForConditionalGeneration": (
        "sglang_npu_tpu.models.kimi_vl", "KimiVLForCausalLM",
    ),
}


def register(arch: str, module: str, cls: str) -> None:
    _REGISTRY[arch] = (module, cls)


def resolve_model_class(architectures):
    for arch in architectures:
        if arch in _REGISTRY:
            module, cls = _REGISTRY[arch]
            return getattr(importlib.import_module(module), cls)
    raise ValueError(
        f"Unsupported architectures {architectures}; known: {sorted(_REGISTRY)}"
    )
