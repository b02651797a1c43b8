"""Tool-call extraction from model output.

Counterpart of the reference's `srt/function_call/` detectors (2,817 LoC:
deepseekv3, llama32, mistral, qwen25, pythonic...).  Round-1 scope: the
common JSON-flavored formats —
  * llama3.2 / qwen2.5 style: `{"name": ..., "arguments"|"parameters": ...}`
  * `<tool_call>{...}</tool_call>` blocks (qwen/hermes)
  * `[TOOL_CALLS] [...]` (mistral)
Returns OpenAI-format tool_calls entries.
"""

from __future__ import annotations

import json
import re
import uuid
from typing import Any, Dict, List, Optional, Tuple

TOOL_CALL_BLOCK = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>", re.DOTALL)
MISTRAL_PREFIX = "[TOOL_CALLS]"


def _mk_call(name: str, arguments: Any) -> Dict[str, Any]:
    if not isinstance(arguments, str):
        arguments = json.dumps(arguments, ensure_ascii=False)
    return {
        "id": f"call_{uuid.uuid4().hex[:24]}",
        "type": "function",
        "function": {"name": name, "arguments": arguments},
    }


def _try_parse_json_call(obj: Any) -> Optional[Dict[str, Any]]:
    if not isinstance(obj, dict):
        return None
    name = obj.get("name")
    if not name:
        return None
    args = obj.get("arguments", obj.get("parameters", {}))
    return _mk_call(name, args)


def parse_tool_calls(
    text: str, parser: Optional[str] = None, tools: Optional[list] = None
) -> Tuple[Optional[List[Dict[str, Any]]], str]:
    """Returns (tool_calls or None, remaining_text).

    With a named `parser` (--tool-call-parser llama3/qwen25/mistral/
    deepseekv3/pythonic/kimi_k2/glm45/step3/qwen3_coder) the per-model
    detector handles the format; otherwise the generic JSON-flavored
    fallback below covers hermes/mistral/bare-JSON outputs.
    """
    if not text:
        return None, text

    from sglang_npu_tpu.function_call.detectors import get_detector

    det = get_detector(parser)
    if det is not None:
        rest, calls = det.detect_and_parse(text, tools)
        if calls:
            return calls, rest
        return None, text

    # <tool_call> blocks
    blocks = TOOL_CALL_BLOCK.findall(text)
    if blocks:
        calls = []
        for b in blocks:
            try:
                c = _try_parse_json_call(json.loads(b))
                if c:
                    calls.append(c)
            except json.JSONDecodeError:
                continue
        if calls:
            rest = TOOL_CALL_BLOCK.sub("", text).strip()
            return calls, rest

    # mistral [TOOL_CALLS] [...]
    idx = text.find(MISTRAL_PREFIX)
    if idx != -1:
        payload = text[idx + len(MISTRAL_PREFIX) :].strip()
        try:
            arr = json.loads(payload)
            if isinstance(arr, dict):
                arr = [arr]
            calls = [c for c in (_try_parse_json_call(o) for o in arr) if c]
            if calls:
                return calls, text[:idx].strip()
        except json.JSONDecodeError:
            pass

    # bare JSON object/array (llama3.2 / qwen2.5 json mode)
    stripped = text.strip()
    if stripped.startswith("{") or stripped.startswith("["):
        try:
            obj = json.loads(stripped)
            arr = obj if isinstance(obj, list) else [obj]
            calls = [c for c in (_try_parse_json_call(o) for o in arr) if c]
            if calls:
                return calls, ""
        except json.JSONDecodeError:
            pass

    return None, text
