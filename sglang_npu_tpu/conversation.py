"""Named chat-template registry.

Counterpart of the reference's `srt/conversation.py` (Conversation
dataclass + ~40 named templates + model-path matching): renders OpenAI
`messages` into a model-family prompt string without relying on the HF
tokenizer's jinja template — needed for tokenizer-less deployments
(byte tokenizer), template overrides (`--chat-template`), and families
whose HF template is missing or wrong.

The template formats themselves are the public, documented prompt formats
of each model family.  Only the commonly served families are registered;
`--chat-template` also accepts a JSON file defining a custom template.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class Conversation:
    """A chat prompt format (reference `Conversation`, conversation.py:37).

    Rendering: ``system_template % system`` (if any system message), then
    for each turn ``role_prefix + content + role_suffix``, and finally the
    assistant role prefix to cue generation.
    """

    name: str
    system_template: str = "{system}"
    system_default: str = ""
    roles: Dict[str, Tuple[str, str]] = dataclasses.field(
        default_factory=dict
    )  # role -> (prefix, suffix)
    assistant_prefix: str = ""
    stop_strs: List[str] = dataclasses.field(default_factory=list)
    prefix: str = ""  # e.g. BOS text

    def render(self, messages: List[dict], add_generation_prompt=True) -> str:
        parts = [self.prefix]
        system = self.system_default
        body = []
        for m in messages:
            role = m.get("role", "user")
            content = m.get("content") or ""
            if isinstance(content, list):  # multimodal content blocks:
                # text concatenates; image/video blocks leave a single
                # placeholder token the HF processor expands (qwen-vl
                # convention; reference conversation.py image_token)
                pieces = []
                for p in content:
                    t = p.get("type")
                    if t == "text":
                        pieces.append(p.get("text", ""))
                    elif t == "image_url":
                        pieces.append(
                            "<|vision_start|><|image_pad|><|vision_end|>"
                        )
                    elif t == "video_url":
                        pieces.append(
                            "<|vision_start|><|video_pad|><|vision_end|>"
                        )
                content = "".join(pieces)
            if role == "system":
                system = content
                continue
            pre, suf = self.roles.get(role, (f"{role}: ", "\n"))
            body.append(pre + content + suf)
        if system:
            parts.append(self.system_template.format(system=system))
        parts.extend(body)
        if add_generation_prompt:
            parts.append(self.assistant_prefix)
        return "".join(parts)


_TEMPLATES: Dict[str, Conversation] = {}


def register(conv: Conversation, aliases: Tuple[str, ...] = ()):
    _TEMPLATES[conv.name] = conv
    for a in aliases:
        _TEMPLATES[a] = conv


register(Conversation(
    name="llama-3",
    system_template=(
        "<|start_header_id|>system<|end_header_id|>\n\n{system}<|eot_id|>"
    ),
    roles={
        "user": ("<|start_header_id|>user<|end_header_id|>\n\n", "<|eot_id|>"),
        "assistant": (
            "<|start_header_id|>assistant<|end_header_id|>\n\n", "<|eot_id|>"
        ),
        "tool": ("<|start_header_id|>ipython<|end_header_id|>\n\n", "<|eot_id|>"),
    },
    assistant_prefix="<|start_header_id|>assistant<|end_header_id|>\n\n",
    stop_strs=["<|eot_id|>"],
    prefix="<|begin_of_text|>",
), aliases=("llama-3.1", "llama-3.2", "llama3"))

register(Conversation(
    name="chatml",
    system_template="<|im_start|>system\n{system}<|im_end|>\n",
    roles={
        "user": ("<|im_start|>user\n", "<|im_end|>\n"),
        "assistant": ("<|im_start|>assistant\n", "<|im_end|>\n"),
        "tool": ("<|im_start|>tool\n", "<|im_end|>\n"),
    },
    assistant_prefix="<|im_start|>assistant\n",
    stop_strs=["<|im_end|>"],
), aliases=("qwen", "qwen2", "qwen2.5", "qwen3", "yi"))

register(Conversation(
    name="llama-2",
    system_template="<<SYS>>\n{system}\n<</SYS>>\n\n",
    roles={
        "user": ("[INST] ", " [/INST]"),
        "assistant": (" ", " </s><s>"),
    },
    assistant_prefix=" ",
    stop_strs=["</s>"],
    prefix="<s>",
), aliases=("llama2",))

register(Conversation(
    name="mistral",
    roles={
        "user": ("[INST] ", " [/INST]"),
        "assistant": ("", "</s>"),
    },
    assistant_prefix="",
    stop_strs=["</s>"],
    prefix="<s>",
))

register(Conversation(
    name="gemma-it",
    roles={
        "user": ("<start_of_turn>user\n", "<end_of_turn>\n"),
        "assistant": ("<start_of_turn>model\n", "<end_of_turn>\n"),
    },
    assistant_prefix="<start_of_turn>model\n",
    stop_strs=["<end_of_turn>"],
    prefix="<bos>",
), aliases=("gemma", "gemma-2", "gemma-3"))

register(Conversation(
    name="deepseek",
    system_template="{system}\n\n",
    roles={
        "user": ("User: ", "\n\n"),
        "assistant": ("Assistant: ", "<｜end▁of▁sentence｜>"),
    },
    assistant_prefix="Assistant: ",
    stop_strs=["<｜end▁of▁sentence｜>"],
    prefix="<｜begin▁of▁sentence｜>",
), aliases=("deepseek-v2", "deepseek-v3"))

register(Conversation(
    name="vicuna_v1.1",
    system_template="{system} ",
    system_default=(
        "A chat between a curious user and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the user's questions."
    ),
    roles={
        "user": ("USER: ", " "),
        "assistant": ("ASSISTANT: ", "</s>"),
    },
    assistant_prefix="ASSISTANT:",
    stop_strs=["</s>"],
))

register(Conversation(
    name="phi-3",
    roles={
        "user": ("<|user|>\n", "<|end|>\n"),
        "assistant": ("<|assistant|>\n", "<|end|>\n"),
    },
    assistant_prefix="<|assistant|>\n",
    stop_strs=["<|end|>"],
))


# model-path keyword -> template (reference match_* registrations)
_MODEL_MATCH = [
    ("llama-3", "llama-3"), ("llama3", "llama-3"), ("llama-2", "llama-2"),
    ("qwen", "chatml"), ("yi-", "chatml"),
    ("mistral", "mistral"), ("mixtral", "mistral"),
    ("gemma", "gemma-it"),
    ("deepseek", "deepseek"),
    ("vicuna", "vicuna_v1.1"),
    ("phi-3", "phi-3"),
]


def get_conv_template(name: str) -> Conversation:
    if name not in _TEMPLATES:
        raise ValueError(
            f"unknown chat template {name!r}; have {sorted(set(_TEMPLATES))}"
        )
    return _TEMPLATES[name]


def load_template(name_or_path: str) -> Conversation:
    """A registered name, or a JSON file defining a custom template
    (reference `--chat-template` file override)."""
    if os.path.isfile(name_or_path):
        with open(name_or_path) as f:
            cfg = json.load(f)
        conv = Conversation(
            name=cfg.get("name", "custom"),
            system_template=cfg.get("system_template", "{system}"),
            system_default=cfg.get("system_default", ""),
            roles={
                k: tuple(v) for k, v in (cfg.get("roles") or {}).items()
            },
            assistant_prefix=cfg.get("assistant_prefix", ""),
            stop_strs=cfg.get("stop_strs", []),
            prefix=cfg.get("prefix", ""),
        )
        register(conv)
        return conv
    return get_conv_template(name_or_path)


def match_model_template(model_path: str) -> Optional[Conversation]:
    low = model_path.lower()
    for key, name in _MODEL_MATCH:
        if key in low:
            return _TEMPLATES[name]
    return None
