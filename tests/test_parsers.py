"""Unit tests: reasoning parser + function-call parser (reference
`test/srt/test_reasoning_parser.py`, function_call parser tests)."""

from sglang_npu_tpu.function_call.parser import parse_tool_calls
from sglang_npu_tpu.reasoning_parser import (
    StreamingReasoningParser,
    split_reasoning,
)


def test_split_reasoning_full_block():
    r, rest = split_reasoning("<think>chain of thought</think>\nanswer")
    assert r == "chain of thought"
    assert rest == "answer"


def test_split_reasoning_bare_close():
    r, rest = split_reasoning("thinking...</think>final", parser="deepseek-r1")
    assert r == "thinking..."
    assert rest == "final"


def test_split_reasoning_none():
    r, rest = split_reasoning("no reasoning here")
    assert r is None
    assert rest == "no reasoning here"


def test_streaming_reasoning():
    p = StreamingReasoningParser("deepseek-r1")
    out = [p.feed(d) for d in ["thi", "nking</th", "ink>ans", "wer"]]
    reasoning = "".join(r for r, _ in out)
    content = "".join(c for _, c in out)
    assert reasoning == "thinking"
    assert content == "answer"


def test_tool_call_block():
    text = 'pre <tool_call>{"name": "get_weather", "arguments": {"city": "SF"}}</tool_call>'
    calls, rest = parse_tool_calls(text)
    assert calls is not None
    assert calls[0]["function"]["name"] == "get_weather"
    assert '"city"' in calls[0]["function"]["arguments"]
    assert rest == "pre"


def test_tool_call_mistral():
    text = '[TOOL_CALLS] [{"name": "f", "arguments": {"x": 1}}]'
    calls, rest = parse_tool_calls(text)
    assert calls[0]["function"]["name"] == "f"
    assert rest == ""


def test_tool_call_bare_json():
    calls, rest = parse_tool_calls('{"name": "f", "parameters": {"a": 2}}')
    assert calls[0]["function"]["name"] == "f"


def test_tool_call_plain_text():
    calls, rest = parse_tool_calls("just some text")
    assert calls is None
    assert rest == "just some text"
