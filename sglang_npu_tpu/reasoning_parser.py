"""Reasoning-content extraction (reference `srt/reasoning_parser.py:257`):
splits DeepSeek-R1 / Qwen3-style `<think>...</think>` blocks out of model
output into `reasoning_content`."""

from __future__ import annotations

from typing import Optional, Tuple

THINK_START = "<think>"
THINK_END = "</think>"


def split_reasoning(
    text: str, parser: Optional[str] = None
) -> Tuple[Optional[str], str]:
    """Returns (reasoning_content, remaining_text).

    parser=None -> auto: split only if a think block is present.
    parser in ("deepseek-r1", "qwen3") -> models that may omit the opening
    tag (the template already emitted it): treat a bare closing tag as the
    boundary.
    """
    if not text:
        return None, text
    if THINK_END not in text:
        return None, text
    start = text.find(THINK_START)
    end = text.find(THINK_END)
    if start != -1 and start < end:
        reasoning = text[start + len(THINK_START) : end]
    elif parser in ("deepseek-r1", "qwen3") or start == -1:
        reasoning = text[:end]
    else:
        return None, text
    rest = text[end + len(THINK_END) :]
    return reasoning.strip() or None, rest.lstrip("\n")


class StreamingReasoningParser:
    """Incremental variant for SSE streaming: feed text deltas, get
    (reasoning_delta, content_delta) pairs."""

    def __init__(self, parser: Optional[str] = None):
        self.parser = parser
        self.in_reasoning = parser in ("deepseek-r1", "qwen3")
        self.buffer = ""
        self.done = False

    def feed(self, delta: str) -> Tuple[str, str]:
        if self.done:
            return "", delta
        self.buffer += delta
        if not self.in_reasoning:
            if THINK_START in self.buffer:
                self.in_reasoning = True
                before, after = self.buffer.split(THINK_START, 1)
                self.buffer = after
                r, c = self.feed("")
                return r, before + c
            # no think-block: hold nothing, pass through
            out, self.buffer = self.buffer, ""
            return "", out
        if THINK_END in self.buffer:
            reasoning, rest = self.buffer.split(THINK_END, 1)
            self.buffer = ""
            self.done = True
            return reasoning, rest.lstrip("\n")
        # Hold back a potential partial closing tag.
        for i in range(min(len(THINK_END) - 1, len(self.buffer)), 0, -1):
            if self.buffer.endswith(THINK_END[:i]):
                out = self.buffer[:-i]
                self.buffer = self.buffer[-i:]
                return out, ""
        out, self.buffer = self.buffer, ""
        return out, ""
