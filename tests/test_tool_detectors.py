"""Per-model tool-call detectors (reference srt/function_call/ detector zoo).

Each test feeds a model-format output through detect_and_parse and through
the streaming adapter fed in small chunks, asserting identical calls.
"""

import json

import pytest

from sglang_npu_tpu.function_call.detectors import get_detector

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
            },
        },
    },
    {
        "type": "function",
        "function": {"name": "search", "parameters": {"type": "object"}},
    },
]


def _stream(det, text, tools=None, chunk=3):
    s = det.streaming()
    s.tools = tools
    deltas = []
    for i in range(0, len(text), chunk):
        deltas += s.feed(text[i : i + chunk])
    deltas += s.finish()
    text_out = "".join(d.get("content", "") for d in deltas)
    calls = {}
    for d in deltas:
        for tc in d.get("tool_calls", []):
            ent = calls.setdefault(tc["index"], {"name": None, "arguments": ""})
            fn = tc.get("function", {})
            if fn.get("name"):
                ent["name"] = fn["name"]
            ent["arguments"] += fn.get("arguments", "")
    return text_out, [calls[k] for k in sorted(calls)]


def _check(parser_name, text, want_calls, want_text=None, tools=None):
    det = get_detector(parser_name)
    rest, calls = det.detect_and_parse(text, tools)
    got = [
        (c["function"]["name"], json.loads(c["function"]["arguments"]))
        for c in calls
    ]
    assert got == want_calls, (parser_name, got)
    if want_text is not None:
        assert rest == want_text
    # streaming path produces the same calls
    stext, scalls = _stream(det, text, tools)
    sgot = [(c["name"], json.loads(c["arguments"])) for c in scalls]
    assert sgot == want_calls, (parser_name, "stream", sgot)
    return rest, stext


def test_llama3_python_tag():
    text = (
        'Sure.<|python_tag|>{"name": "get_weather", "arguments": {"city": "Paris"}};'
        '{"name": "search", "arguments": {"q": "x"}}'
    )
    _check(
        "llama3",
        text,
        [("get_weather", {"city": "Paris"}), ("search", {"q": "x"})],
        want_text="Sure.",
    )


def test_llama3_bare_json():
    text = '{"name": "get_weather", "arguments": {"city": "Oslo", "days": 2}}'
    _check("llama3", text, [("get_weather", {"city": "Oslo", "days": 2})])


def test_qwen25_hermes_blocks():
    text = (
        "let me check\n<tool_call>\n"
        '{"name": "get_weather", "arguments": {"city": "Lima"}}\n'
        "</tool_call>\n<tool_call>\n"
        '{"name": "search", "arguments": {"q": "llamas"}}\n</tool_call>'
    )
    rest, _ = _check(
        "qwen25",
        text,
        [("get_weather", {"city": "Lima"}), ("search", {"q": "llamas"})],
    )
    assert rest == "let me check"


def test_mistral():
    text = 'hi [TOOL_CALLS] [{"name": "search", "arguments": {"q": "a b"}}]'
    _check("mistral", text, [("search", {"q": "a b"})], want_text="hi")


def test_deepseekv3():
    text = (
        "thinking...<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
        "<｜tool▁sep｜>get_weather\n```json\n"
        '{"city": "Tokyo", "days": 3}\n```<｜tool▁call▁end｜>'
        "<｜tool▁calls▁end｜>"
    )
    _check(
        "deepseekv3",
        text,
        [("get_weather", {"city": "Tokyo", "days": 3})],
        want_text="thinking...",
    )


def test_pythonic():
    text = '[get_weather(city="NYC", days=5), search(q="cats")]'
    _check(
        "pythonic",
        text,
        [("get_weather", {"city": "NYC", "days": 5}), ("search", {"q": "cats"})],
    )


def test_pythonic_llama4_wrappers():
    text = '<|python_start|>[get_weather(city="LA")]<|python_end|>'
    det = get_detector("pythonic")
    rest, calls = det.detect_and_parse(text, TOOLS)
    assert [c["function"]["name"] for c in calls] == ["get_weather"]


def test_kimi_k2():
    text = (
        "ok<|tool_calls_section_begin|><|tool_call_begin|>"
        "functions.get_weather:0<|tool_call_argument_begin|>"
        '{"city": "Berlin"}<|tool_call_end|><|tool_calls_section_end|>'
    )
    _check("kimi_k2", text, [("get_weather", {"city": "Berlin"})], want_text="ok")


def test_glm45_typed_args():
    text = (
        "<tool_call>get_weather\n"
        "<arg_key>city</arg_key><arg_value>Madrid</arg_value>\n"
        "<arg_key>days</arg_key><arg_value>7</arg_value>\n"
        "</tool_call>"
    )
    # days is declared integer -> coerced; city stays a raw string
    _check(
        "glm45", text, [("get_weather", {"city": "Madrid", "days": 7})], tools=TOOLS
    )


def test_step3():
    text = (
        "<｜tool_calls_begin｜><｜tool_call_begin｜>function<｜tool_sep｜>"
        '<steptml:invoke name="get_weather">'
        '<steptml:parameter name="city">Rome</steptml:parameter>'
        '<steptml:parameter name="days">4</steptml:parameter>'
        "</steptml:invoke><｜tool_call_end｜><｜tool_calls_end｜>"
    )
    _check(
        "step3", text, [("get_weather", {"city": "Rome", "days": 4})], tools=TOOLS
    )


def test_qwen3_coder():
    text = (
        "<tool_call>\n<function=get_weather>\n"
        "<parameter=city>\nSeoul\n</parameter>\n"
        "<parameter=days>\n2\n</parameter>\n"
        "</function>\n</tool_call>"
    )
    _check(
        "qwen3_coder", text, [("get_weather", {"city": "Seoul", "days": 2})],
        tools=TOOLS,
    )


def test_no_tool_call_passthrough():
    for name in (
        "llama3",
        "qwen25",
        "mistral",
        "deepseekv3",
        "pythonic",
        "kimi_k2",
        "glm45",
        "step3",
        "qwen3_coder",
    ):
        det = get_detector(name)
        rest, calls = det.detect_and_parse("just a plain answer.", TOOLS)
        assert calls == []
        # streaming path: plain text streams through unchanged
        stext, scalls = _stream(det, "just a plain answer.", TOOLS)
        assert scalls == []
        assert stext == "just a plain answer."


def test_streaming_text_before_marker_streams_early():
    det = get_detector("qwen25")
    s = det.streaming()
    deltas = s.feed("Hello wor")
    assert "".join(d.get("content", "") for d in deltas) == "Hello wor"
    deltas = s.feed("ld <tool")  # "<tool" held back as potential marker
    assert "".join(d.get("content", "") for d in deltas) == "ld "
    deltas = s.feed('_call>{"name": "search", "arguments": {}}</tool_call>')
    names = [
        tc["function"].get("name")
        for d in deltas
        for tc in d.get("tool_calls", [])
        if tc.get("function", {}).get("name")
    ]
    assert names == ["search"]
    assert s.finish() == []


def test_parse_tool_calls_dispatches_by_name():
    from sglang_npu_tpu.function_call.parser import parse_tool_calls

    text = (
        "<tool_call>get_weather\n"
        "<arg_key>city</arg_key><arg_value>Cork</arg_value>\n</tool_call>"
    )
    calls, rest = parse_tool_calls(text, "glm45", tools=TOOLS)
    assert calls and calls[0]["function"]["name"] == "get_weather"
    # generic fallback still handles hermes without a named parser
    calls, rest = parse_tool_calls(
        '<tool_call>{"name": "search", "arguments": {}}</tool_call>', None
    )
    assert calls and calls[0]["function"]["name"] == "search"
