"""Per-request sampling parameters.

Behavioral parity with the reference's `srt/sampling/sampling_params.py`
(field names, defaults, validation), re-designed for a JAX sampler: all
numeric knobs are later tensorized into `SamplingBatchInfo` device arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Union

TOP_K_ALL = 1 << 30


@dataclasses.dataclass
class SamplingParams:
    max_new_tokens: int = 128
    min_new_tokens: int = 0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    repetition_penalty: float = 1.0
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[int]] = None
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    regex: Optional[str] = None
    json_schema: Optional[str] = None
    ebnf: Optional[str] = None
    structural_tag: Optional[str] = None
    n: int = 1
    no_stop_trim: bool = False
    custom_params: Optional[Dict[str, Any]] = None
    # OpenAI logit_bias: {token_id: bias in [-100, 100]} added to logits
    logit_bias: Optional[Dict[Any, float]] = None

    def __post_init__(self):
        if self.logit_bias:
            self.logit_bias = {
                int(k): float(v) for k, v in self.logit_bias.items()
            }
        if self.stop is None:
            self.stop_strs: List[str] = []
        elif isinstance(self.stop, str):
            self.stop_strs = [self.stop]
        else:
            self.stop_strs = list(self.stop)
        self.stop_str_max_len = max((len(s) for s in self.stop_strs), default=0)
        if self.stop_token_ids is None:
            self.stop_token_ids = []
        self.verify()

    def verify(self):
        if self.temperature < 0.0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if not 0.0 <= self.min_p <= 1.0:
            raise ValueError(f"min_p must be in [0, 1], got {self.min_p}")
        if self.top_k < -1 or self.top_k == 0:
            raise ValueError(f"top_k must be -1 (all) or >= 1, got {self.top_k}")
        if not -2.0 <= self.frequency_penalty <= 2.0:
            raise ValueError("frequency_penalty must be in [-2, 2]")
        if not -2.0 <= self.presence_penalty <= 2.0:
            raise ValueError("presence_penalty must be in [-2, 2]")
        if not 0.0 < self.repetition_penalty <= 2.0:
            raise ValueError("repetition_penalty must be in (0, 2]")
        if self.max_new_tokens < 0:
            raise ValueError("max_new_tokens must be >= 0")
        if self.min_new_tokens < 0 or self.min_new_tokens > self.max_new_tokens:
            raise ValueError("0 <= min_new_tokens <= max_new_tokens required")
        grammar_fields = [self.regex, self.json_schema, self.ebnf, self.structural_tag]
        if sum(x is not None for x in grammar_fields) > 1:
            raise ValueError("only one of regex/json_schema/ebnf/structural_tag allowed")

    @property
    def effective_top_k(self) -> int:
        return TOP_K_ALL if self.top_k == -1 else self.top_k

    @property
    def is_greedy(self) -> bool:
        return self.temperature == 0.0 or self.top_k == 1

    @classmethod
    def from_dict(cls, d: Optional[Dict[str, Any]]) -> "SamplingParams":
        if not d:
            return cls()
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})
