"""Fill-in-the-middle (FIM) completion templates.

Counterpart of the reference's `srt/code_completion_parser.py`
(`generate_completion_prompt`, completion-template registry): an OpenAI
`/v1/completions` request with `suffix` renders the model family's FIM
prompt format.  The sentinel tokens are the public, documented formats of
each code-model family.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class CompletionTemplate:
    name: str
    fim_begin: str  # before the prefix
    fim_hole: str  # between prefix and suffix
    fim_end: str  # after the suffix (generation cue)

    def render(self, prefix: str, suffix: str) -> str:
        return (
            f"{self.fim_begin}{prefix}{self.fim_hole}{suffix}{self.fim_end}"
        )


_TEMPLATES: Dict[str, CompletionTemplate] = {}


def _reg(t: CompletionTemplate):
    _TEMPLATES[t.name] = t


_reg(CompletionTemplate(
    "deepseek-coder", "<｜fim▁begin｜>", "<｜fim▁hole｜>", "<｜fim▁end｜>"
))
_reg(CompletionTemplate(
    "starcoder", "<fim_prefix>", "<fim_suffix>", "<fim_middle>"
))
_reg(CompletionTemplate(
    "qwen-coder", "<|fim_prefix|>", "<|fim_suffix|>", "<|fim_middle|>"
))
_reg(CompletionTemplate("codellama", "<PRE> ", " <SUF>", " <MID>"))
_reg(CompletionTemplate(
    "codegemma", "<|fim_prefix|>", "<|fim_suffix|>", "<|fim_middle|>"
))

_MODEL_MATCH = [
    ("deepseek", "deepseek-coder"),
    ("starcoder", "starcoder"),
    ("santacoder", "starcoder"),
    ("qwen", "qwen-coder"),
    ("codellama", "codellama"),
    ("codegemma", "codegemma"),
]


def get_completion_template(name: str) -> CompletionTemplate:
    if name not in _TEMPLATES:
        raise ValueError(
            f"unknown completion template {name!r}; "
            f"have {sorted(_TEMPLATES)}"
        )
    return _TEMPLATES[name]


def match_completion_template(model_path: str) -> Optional[CompletionTemplate]:
    low = model_path.lower()
    for key, name in _MODEL_MATCH:
        if key in low:
            return _TEMPLATES[name]
    return None


def build_fim_prompt(
    prefix: str, suffix: str, model_path: str,
    template_name: Optional[str] = None,
) -> str:
    """Render the FIM prompt; raises ValueError when no template applies
    (reference rejects suffix-completions without a completion template)."""
    tpl = (
        get_completion_template(template_name)
        if template_name
        else match_completion_template(model_path)
    )
    if tpl is None:
        raise ValueError(
            "suffix completion needs --completion-template (no FIM format "
            f"known for model {model_path!r})"
        )
    return tpl.render(prefix, suffix)
