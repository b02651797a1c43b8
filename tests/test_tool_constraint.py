"""tool_choice-constrained decoding (reference ebnf_composer +
get_structure_constraint): the composed regex must compile in the FSM
engine, accept a canonical model output for the format, and that output
must round-trip through the matching detector.
"""

import json

import pytest

from sglang_npu_tpu.constrained.regex_engine import LazyDFA
from sglang_npu_tpu.function_call.detectors import get_detector
from sglang_npu_tpu.function_call.tool_constraint import build_tool_constraint

TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "get_weather",
            "parameters": {
                "type": "object",
                "properties": {
                    "city": {"type": "string"},
                    "days": {"type": "integer"},
                },
                "required": ["city", "days"],
            },
        },
    },
    {
        "type": "function",
        "function": {
            "name": "search",
            "parameters": {
                "type": "object",
                "properties": {"q": {"type": "string"}},
                "required": ["q"],
            },
        },
    },
]

SAMPLES = {
    "llama3": '{"name": "get_weather", "parameters": {"city": "Oslo", "days": 2}}',
    "qwen25": '<tool_call>{"name": "get_weather", "arguments": '
    '{"city": "Oslo", "days": 2}}</tool_call>',
    "mistral": '[TOOL_CALLS] [{"name": "search", "arguments": {"q": "x"}}]',
    "deepseekv3": (
        "<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function<｜tool▁sep｜>"
        'get_weather\n```json\n{"city": "Oslo", "days": 2}\n```'
        "<｜tool▁call▁end｜><｜tool▁calls▁end｜>"
    ),
    "kimi_k2": (
        "<|tool_calls_section_begin|><|tool_call_begin|>functions.search:0"
        '<|tool_call_argument_begin|>{"q": "x"}<|tool_call_end|>'
        "<|tool_calls_section_end|>"
    ),
    "pythonic": '[get_weather(city="Oslo", days=2)]',
    "glm45": (
        "<tool_call>get_weather\n"
        "<arg_key>city</arg_key><arg_value>Oslo</arg_value>"
        "<arg_key>days</arg_key><arg_value>2</arg_value></tool_call>"
    ),
    "step3": (
        "<｜tool_calls_begin｜><｜tool_call_begin｜>function<｜tool_sep｜>"
        '<steptml:invoke name="get_weather">'
        '<steptml:parameter name="city">Oslo</steptml:parameter>'
        '<steptml:parameter name="days">2</steptml:parameter>'
        "</steptml:invoke><｜tool_call_end｜><｜tool_calls_end｜>"
    ),
    "qwen3_coder": (
        "<tool_call><function=get_weather>"
        "<parameter=city>Oslo</parameter>"
        "<parameter=days>2</parameter>"
        "</function></tool_call>"
    ),
}


@pytest.mark.parametrize("parser_name", sorted(SAMPLES))
def test_required_constraint_accepts_canonical_output(parser_name):
    kind, pattern = build_tool_constraint(TOOLS, "required", parser_name)
    assert kind == "regex"
    dfa = LazyDFA(pattern)
    sample = SAMPLES[parser_name]
    assert dfa.accepts(sample.encode("utf-8")), parser_name
    # and the matching detector parses the constrained output back
    det = get_detector(parser_name)
    _rest, calls = det.detect_and_parse(sample, TOOLS)
    assert calls, parser_name
    name = calls[0]["function"]["name"]
    assert name in ("get_weather", "search")
    args = json.loads(calls[0]["function"]["arguments"])
    assert isinstance(args, dict) and args


def test_named_function_restricts_to_that_function():
    choice = {"type": "function", "function": {"name": "search"}}
    _kind, pattern = build_tool_constraint(TOOLS, choice, "qwen25")
    dfa = LazyDFA(pattern)
    ok = '<tool_call>{"name": "search", "arguments": {"q": "x"}}</tool_call>'
    bad = (
        '<tool_call>{"name": "get_weather", "arguments": '
        '{"city": "Oslo", "days": 2}}</tool_call>'
    )
    assert dfa.accepts(ok.encode())
    assert not dfa.accepts(bad.encode())


def test_auto_and_none_do_not_constrain():
    assert build_tool_constraint(TOOLS, "auto", "qwen25") is None
    assert build_tool_constraint(TOOLS, "none", "qwen25") is None
    assert build_tool_constraint([], "required", "qwen25") is None


def test_constraint_rejects_free_text():
    _kind, pattern = build_tool_constraint(TOOLS, "required", "qwen25")
    dfa = LazyDFA(pattern)
    assert not dfa.accepts(b"The weather is nice today.")


def test_multiple_calls_accepted():
    _kind, pattern = build_tool_constraint(TOOLS, "required", "qwen25")
    dfa = LazyDFA(pattern)
    two = (
        '<tool_call>{"name": "search", "arguments": {"q": "a"}}</tool_call>'
        '\n<tool_call>{"name": "search", "arguments": {"q": "b"}}</tool_call>'
    )
    assert dfa.accepts(two.encode())
