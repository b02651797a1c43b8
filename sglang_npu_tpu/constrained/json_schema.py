"""JSON-schema -> regex compilation (subset).

Replaces the reference's xgrammar JSON-schema support for the built-in FSM
backend.  Covers the schema features used by OpenAI `response_format`
json_schema in practice: object with properties/required, string (+enum,
const), integer, number, boolean, null, arrays with item schemas, nested
objects, additionalProperties=false semantics.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict

WS = r"[ \n\t]*"
STRING_RE = r'"([^"\\\x00-\x1f]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})*"'
INT_RE = r"-?(0|[1-9]\d*)"
NUMBER_RE = r"-?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?"
BOOL_RE = r"(true|false)"
NULL_RE = r"null"


def _esc_literal(s: str) -> str:
    out = []
    for ch in s:
        if ch in r"\.[]{}()*+?|^$/":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def schema_to_regex(schema: Dict[str, Any], depth: int = 0) -> str:
    if depth > 8:
        raise ValueError("schema nesting too deep")
    if not isinstance(schema, dict):
        return _any_value_regex()
    if "const" in schema:
        return _esc_literal(json.dumps(schema["const"]))
    if "enum" in schema:
        return "(" + "|".join(_esc_literal(json.dumps(v)) for v in schema["enum"]) + ")"
    t = schema.get("type")
    if isinstance(t, list):
        return "(" + "|".join(
            schema_to_regex({**schema, "type": ti}, depth + 1) for ti in t
        ) + ")"
    if t == "string":
        if "pattern" in schema:
            # embed the user pattern inside quotes (best effort)
            return '"' + schema["pattern"] + '"'
        return STRING_RE
    if t == "integer":
        return INT_RE
    if t == "number":
        return NUMBER_RE
    if t == "boolean":
        return BOOL_RE
    if t == "null":
        return NULL_RE
    if t == "array":
        item = schema_to_regex(schema.get("items", {}), depth + 1)
        min_items = schema.get("minItems", 0)
        core = item + f"({WS},{WS}" + item + ")*"
        if min_items > 0:
            return r"\[" + WS + core + WS + r"\]"
        return r"\[" + WS + "(" + core + ")?" + WS + r"\]"
    if t == "object" or "properties" in schema:
        props = schema.get("properties", {})
        required = set(schema.get("required", list(props.keys())))
        parts = []
        for name, sub in props.items():
            key = _esc_literal(json.dumps(name))
            val = schema_to_regex(sub, depth + 1)
            pair = key + WS + ":" + WS + val
            parts.append((pair, name in required))
        if not parts:
            return r"\{" + WS + r"\}"
        # fixed property order (the standard FSM-guidance simplification)
        segs = []
        first = True
        for pair, req in parts:
            if first:
                seg = pair
                first = False
            else:
                seg = WS + "," + WS + pair
            segs.append(f"({seg})" + ("" if req else "?"))
        return r"\{" + WS + "".join(segs) + WS + r"\}"
    return _any_value_regex()


def _any_value_regex() -> str:
    # any scalar or shallow composite
    scalar = f"({STRING_RE}|{NUMBER_RE}|{BOOL_RE}|{NULL_RE})"
    arr = r"\[" + WS + f"({scalar}({WS},{WS}{scalar})*)?" + WS + r"\]"
    obj = r"\{" + WS + f"({STRING_RE}{WS}:{WS}{scalar}({WS},{WS}{STRING_RE}{WS}:{WS}{scalar})*)?" + WS + r"\}"
    return f"({scalar}|{arr}|{obj})"


def build_json_regex(json_schema_str: str) -> str:
    schema = json.loads(json_schema_str) if isinstance(json_schema_str, str) else json_schema_str
    return schema_to_regex(schema)
