"""OpenAI-compatible API schemas.

Counterpart of the reference's `srt/entrypoints/openai/protocol.py` (647 LoC
of pydantic models).  This image has no pydantic, so the schemas are plain
dataclasses with explicit `from_dict` validation producing the same wire
format (error messages included).
"""

from __future__ import annotations

import dataclasses
import time
import uuid
from typing import Any, Dict, List, Optional, Union


class ValidationError(ValueError):
    pass


def _expect(cond: bool, msg: str):
    if not cond:
        raise ValidationError(msg)


@dataclasses.dataclass
class UsageInfo:
    prompt_tokens: int = 0
    completion_tokens: int = 0
    total_tokens: int = 0
    prompt_tokens_details: Optional[Dict[str, int]] = None

    def to_dict(self):
        d = {
            "prompt_tokens": self.prompt_tokens,
            "completion_tokens": self.completion_tokens,
            "total_tokens": self.total_tokens,
        }
        if self.prompt_tokens_details:
            d["prompt_tokens_details"] = self.prompt_tokens_details
        return d


# ----------------------------------------------------------------------
@dataclasses.dataclass
class CompletionRequest:
    model: str
    prompt: Union[str, List[str], List[int], List[List[int]]]
    best_of: Optional[int] = None
    echo: bool = False
    frequency_penalty: float = 0.0
    logit_bias: Optional[Dict[str, float]] = None
    logprobs: Optional[int] = None
    max_tokens: int = 16
    n: int = 1
    presence_penalty: float = 0.0
    seed: Optional[int] = None
    stop: Optional[Union[str, List[str]]] = None
    stream: bool = False
    suffix: Optional[str] = None
    temperature: float = 1.0
    top_p: float = 1.0
    user: Optional[str] = None
    # sglang extensions (reference protocol.py CompletionRequest)
    top_k: int = -1
    min_p: float = 0.0
    min_tokens: int = 0
    repetition_penalty: float = 1.0
    regex: Optional[str] = None
    json_schema: Optional[str] = None
    ebnf: Optional[str] = None
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    lora_path: Optional[str] = None
    stream_options: Optional[Dict[str, Any]] = None

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "CompletionRequest":
        _expect(isinstance(d, dict), "body must be a JSON object")
        _expect("prompt" in d, "you must provide a prompt")
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        kwargs.setdefault("model", "default")
        req = cls(**kwargs)
        _expect(1 <= req.n <= 16, "n must be in [1, 16]")
        _expect(req.max_tokens >= 0, "max_tokens must be >= 0")
        return req

    def to_sampling_params(self) -> Dict[str, Any]:
        return {
            "max_new_tokens": self.max_tokens,
            "min_new_tokens": self.min_tokens,
            "temperature": self.temperature,
            "top_p": self.top_p,
            "top_k": self.top_k,
            "min_p": self.min_p,
            "frequency_penalty": self.frequency_penalty,
            "presence_penalty": self.presence_penalty,
            "repetition_penalty": self.repetition_penalty,
            "stop": self.stop,
            "ignore_eos": self.ignore_eos,
            "skip_special_tokens": self.skip_special_tokens,
            "regex": self.regex,
            "json_schema": self.json_schema,
            "ebnf": self.ebnf,
            "logit_bias": self.logit_bias,
        }


# ----------------------------------------------------------------------
@dataclasses.dataclass
class ChatCompletionRequest:
    model: str
    messages: List[Dict[str, Any]]
    frequency_penalty: float = 0.0
    logit_bias: Optional[Dict[str, float]] = None
    logprobs: bool = False
    top_logprobs: Optional[int] = None
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    n: int = 1
    presence_penalty: float = 0.0
    response_format: Optional[Dict[str, Any]] = None
    seed: Optional[int] = None
    stop: Optional[Union[str, List[str]]] = None
    stream: bool = False
    stream_options: Optional[Dict[str, Any]] = None
    temperature: float = 1.0
    top_p: float = 1.0
    user: Optional[str] = None
    tools: Optional[List[Dict[str, Any]]] = None
    tool_choice: Union[str, Dict[str, Any], None] = "auto"
    # sglang extensions
    top_k: int = -1
    min_p: float = 0.0
    min_tokens: int = 0
    repetition_penalty: float = 1.0
    regex: Optional[str] = None
    ebnf: Optional[str] = None
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    lora_path: Optional[str] = None
    separate_reasoning: bool = True

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ChatCompletionRequest":
        _expect(isinstance(d, dict), "body must be a JSON object")
        _expect(
            isinstance(d.get("messages"), list) and d["messages"],
            "messages must be a non-empty list",
        )
        for m in d["messages"]:
            _expect(
                isinstance(m, dict) and "role" in m,
                "each message needs a 'role'",
            )
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        kwargs.setdefault("model", "default")
        req = cls(**kwargs)
        _expect(1 <= req.n <= 16, "n must be in [1, 16]")
        return req

    @property
    def effective_max_tokens(self) -> int:
        return self.max_completion_tokens or self.max_tokens or 1024

    def to_sampling_params(self) -> Dict[str, Any]:
        json_schema = None
        if self.response_format:
            rtype = self.response_format.get("type")
            if rtype == "json_schema":
                import json as _json

                schema = self.response_format.get("json_schema", {}).get("schema")
                json_schema = _json.dumps(schema) if schema else None
            elif rtype == "json_object":
                json_schema = '{"type": "object"}'
        return {
            "max_new_tokens": self.effective_max_tokens,
            "min_new_tokens": self.min_tokens,
            "temperature": self.temperature,
            "top_p": self.top_p,
            "top_k": self.top_k,
            "min_p": self.min_p,
            "frequency_penalty": self.frequency_penalty,
            "presence_penalty": self.presence_penalty,
            "repetition_penalty": self.repetition_penalty,
            "stop": self.stop,
            "ignore_eos": self.ignore_eos,
            "skip_special_tokens": self.skip_special_tokens,
            "regex": self.regex,
            "json_schema": json_schema,
            "ebnf": self.ebnf,
            "logit_bias": self.logit_bias,
        }


# ----------------------------------------------------------------------
def completion_response(
    rid: str,
    model: str,
    choices: List[Dict[str, Any]],
    usage: UsageInfo,
    object_type: str = "text_completion",
) -> Dict[str, Any]:
    return {
        "id": rid,
        "object": object_type,
        "created": int(time.time()),
        "model": model,
        "choices": choices,
        "usage": usage.to_dict(),
    }


def chat_response(
    rid: str, model: str, choices: List[Dict[str, Any]], usage: UsageInfo
) -> Dict[str, Any]:
    return {
        "id": rid,
        "object": "chat.completion",
        "created": int(time.time()),
        "model": model,
        "choices": choices,
        "usage": usage.to_dict(),
    }


def gen_request_id(prefix: str = "cmpl") -> str:
    return f"{prefix}-{uuid.uuid4().hex}"


def map_finish_reason(reason: Optional[Dict[str, Any]]) -> Optional[str]:
    if reason is None:
        return None
    t = reason.get("type")
    if t == "length":
        return "length"
    if t == "abort":
        return "abort"
    if t == "tool_calls":
        return "tool_calls"
    return "stop"
