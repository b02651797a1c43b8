"""Constrained decoding for tool calls (``tool_choice`` enforcement).

Counterpart of the reference's `srt/function_call/ebnf_composer.py` +
`FunctionCallParser.get_structure_constraint` (function_call_parser.py:147):
when a chat request sets ``tool_choice: "required"`` or names a specific
function, the model output must be a syntactically-valid tool call in the
server's --tool-call-parser format.  The reference composes EBNF for
xgrammar; our grammar backend compiles regex -> byte-FSM, so we compose a
regex directly (reusing the JSON-schema -> regex compiler for argument
bodies).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Tuple

from sglang_npu_tpu.constrained.json_schema import (
    BOOL_RE,
    INT_RE,
    NUMBER_RE,
    NULL_RE,
    STRING_RE,
    WS,
    _esc_literal,
    schema_to_regex,
)


def _functions(tools: List[dict]) -> List[dict]:
    out = []
    for t in tools or []:
        fn = t.get("function", t) if isinstance(t, dict) else None
        if fn and fn.get("name"):
            out.append(fn)
    return out


def _allowed_functions(tools, tool_choice) -> Optional[List[dict]]:
    """None = no constraint requested."""
    fns = _functions(tools)
    if not fns:
        return None
    if isinstance(tool_choice, dict):
        name = (tool_choice.get("function") or {}).get("name")
        picked = [f for f in fns if f["name"] == name]
        return picked or None
    if isinstance(tool_choice, str) and tool_choice.lower() == "required":
        return fns
    return None


def _json_call_re(fn: dict, args_key: str = "arguments") -> str:
    """Regex for ``{"name": "X", "arguments": {...schema...}}``."""
    args = schema_to_regex(fn.get("parameters") or {"type": "object"})
    return (
        r"\{" + WS
        + '"name"' + WS + ":" + WS + _esc_literal(json.dumps(fn["name"]))
        + WS + "," + WS
        + f'"{args_key}"' + WS + ":" + WS + args
        + WS + r"\}"
    )


def _args_only_re(fn: dict) -> str:
    return schema_to_regex(fn.get("parameters") or {"type": "object"})


def _param_value_re(spec: dict) -> str:
    """Bare (unquoted-capable) value regex for XML-ish formats where string
    parameters appear raw between tags."""
    t = (spec or {}).get("type")
    if t == "integer":
        return INT_RE
    if t == "number":
        return NUMBER_RE
    if t == "boolean":
        return BOOL_RE
    if t == "null":
        return NULL_RE
    if t in ("object", "array"):
        return schema_to_regex(spec)
    # raw string: anything not starting a closing tag
    return r"[^<]*"


def _py_value_re(spec: dict) -> str:
    t = (spec or {}).get("type")
    if t == "integer":
        return INT_RE
    if t == "number":
        return NUMBER_RE
    if t == "boolean":
        return "(True|False)"
    if t in ("object", "array"):
        return schema_to_regex(spec)
    return STRING_RE


def _kv_format_call_re(
    fn: dict,
    pre_key: str,
    post_key: str,
    pre_val_fn,
    post_val: str,
    sep: str,
) -> str:
    """Fixed-order key/value call body (glm45 / step3 / qwen3_coder)."""
    props = (fn.get("parameters") or {}).get("properties") or {}
    required = set((fn.get("parameters") or {}).get("required") or props.keys())
    segs = []
    for key, spec in props.items():
        seg = (
            pre_key + _esc_literal(key) + post_key
            + pre_val_fn(spec) + post_val + sep
        )
        segs.append(f"({seg})" + ("" if key in required else "?"))
    return "".join(segs)


def build_tool_constraint(
    tools: List[dict],
    tool_choice: Any,
    parser_name: Optional[str],
) -> Optional[Tuple[str, str]]:
    """Compose the decode constraint for a tool_choice request.

    Returns ("regex", pattern) or None when no constraint applies.
    """
    fns = _allowed_functions(tools, tool_choice)
    if not fns:
        return None
    name = parser_name or "qwen25"  # hermes blocks = our generic default

    def _alt(parts: List[str]) -> str:
        return "(" + "|".join(parts) + ")" if len(parts) > 1 else parts[0]

    if name == "llama3":
        call = _alt([_json_call_re(f, "parameters") for f in fns])
        return "regex", call + "(;" + call + ")*"

    if name == "mistral":
        call = _alt([_json_call_re(f) for f in fns])
        return (
            "regex",
            _esc_literal("[TOOL_CALLS]") + WS
            + r"\[" + WS + call + "(" + WS + "," + WS + call + ")*" + WS + r"\]",
        )

    if name == "deepseekv3":
        calls = []
        for f in fns:
            calls.append(
                _esc_literal("<｜tool▁call▁begin｜>function<｜tool▁sep｜>")
                + _esc_literal(f["name"])
                + _esc_literal("\n```json\n")
                + _args_only_re(f)
                + _esc_literal("\n```<｜tool▁call▁end｜>")
            )
        call = _alt(calls)
        return (
            "regex",
            _esc_literal("<｜tool▁calls▁begin｜>")
            + call + "(" + WS + call + ")*"
            + _esc_literal("<｜tool▁calls▁end｜>"),
        )

    if name == "kimi_k2":
        calls = []
        for i, f in enumerate(fns):
            calls.append(
                _esc_literal("<|tool_call_begin|>functions.")
                + _esc_literal(f["name"])
                + r":\d+"
                + _esc_literal("<|tool_call_argument_begin|>")
                + _args_only_re(f)
                + _esc_literal("<|tool_call_end|>")
            )
        call = _alt(calls)
        return (
            "regex",
            _esc_literal("<|tool_calls_section_begin|>")
            + call + "(" + call + ")*"
            + _esc_literal("<|tool_calls_section_end|>"),
        )

    if name == "pythonic":
        calls = []
        for f in fns:
            props = (f.get("parameters") or {}).get("properties") or {}
            required = set((f.get("parameters") or {}).get("required") or props)
            segs = []
            first = True
            for key, spec in props.items():
                pair = _esc_literal(key) + "=" + _py_value_re(spec)
                seg = pair if first else ", " + pair
                segs.append(f"({seg})" + ("" if key in required else "?"))
                first = False
            calls.append(_esc_literal(f["name"]) + r"\(" + "".join(segs) + r"\)")
        call = _alt(calls)
        return "regex", r"\[" + call + "(, " + call + r")*\]"

    if name == "glm45":
        calls = []
        for f in fns:
            body = _kv_format_call_re(
                f,
                pre_key="<arg_key>",
                post_key="</arg_key>" + WS + "<arg_value>",
                pre_val_fn=_param_value_re,
                post_val="</arg_value>",
                sep=WS,
            )
            calls.append(
                "<tool_call>" + _esc_literal(f["name"]) + r"\n" + body
                + "</tool_call>"
            )
        call = _alt(calls)
        return "regex", call + "(" + WS + call + ")*"

    if name == "step3":
        calls = []
        for f in fns:
            body = _kv_format_call_re(
                f,
                pre_key='<steptml:parameter name="',
                post_key='">',
                pre_val_fn=_param_value_re,
                post_val="</steptml:parameter>",
                sep=WS,
            )
            calls.append(
                _esc_literal("<｜tool_call_begin｜>function<｜tool_sep｜>")
                + '<steptml:invoke name="' + _esc_literal(f["name"]) + '">' + WS
                + body
                + "</steptml:invoke>" + _esc_literal("<｜tool_call_end｜>")
            )
        call = _alt(calls)
        return (
            "regex",
            _esc_literal("<｜tool_calls_begin｜>") + WS
            + call + "(" + WS + call + ")*"
            + _esc_literal("<｜tool_calls_end｜>"),
        )

    if name == "qwen3_coder":
        calls = []
        for f in fns:
            body = _kv_format_call_re(
                f,
                pre_key="<parameter=",
                post_key=">" + WS,
                pre_val_fn=_param_value_re,
                post_val=WS + "</parameter>",
                sep=WS,
            )
            calls.append(
                "<tool_call>" + WS + "<function=" + _esc_literal(f["name"]) + ">"
                + WS + body + "</function>" + WS + "</tool_call>"
            )
        call = _alt(calls)
        return "regex", call + "(" + WS + call + ")*"

    # qwen25 / hermes / unknown parsers: <tool_call>{json}</tool_call>
    # (no WS loop before the close tag: after the final "}" the close tag
    # is the unique continuation, so jump-forward completes it in one step)
    call = _alt([_json_call_re(f) for f in fns])
    block = "<tool_call>" + WS + call + "</tool_call>"
    return "regex", block + "(" + WS + block + ")*"
