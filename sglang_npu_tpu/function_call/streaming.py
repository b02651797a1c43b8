"""Incremental (streaming) tool-call parsing.

Counterpart of the reference's streaming detectors
(`srt/function_call/base_format_detector.py parse_streaming_increment` +
per-model detectors with partial-json): turns a stream of text deltas into
OpenAI `chat.completion.chunk` deltas — plain content, or `tool_calls`
entries where the function name arrives first and the arguments stream as
raw JSON fragments.

Formats:
  * hermes/qwen ``<tool_call>{...}</tool_call>`` — fully incremental:
    the name is emitted as soon as its key parses; argument bytes stream
    as they arrive (brace-depth scanner, string/escape aware)
  * mistral ``[TOOL_CALLS] [...]`` and bare leading JSON — buffered until
    the value balances, then emitted as complete calls (these formats put
    multiple calls in one array; fragment-accurate streaming would
    misattribute commas between calls)

Text that might be a marker prefix (e.g. a chunk ending in ``<tool_``)
is held back until disambiguated, so markers never leak into content.
"""

from __future__ import annotations

import json
import re
import uuid
from typing import Any, Dict, List, Optional

HERMES_OPEN = "<tool_call>"
HERMES_CLOSE = "</tool_call>"
MISTRAL_OPEN = "[TOOL_CALLS]"
_NAME_RE = re.compile(r'"name"\s*:\s*"((?:[^"\\]|\\.)*)"')
_ARGS_RE = re.compile(r'"(?:arguments|parameters)"\s*:\s*')


def _call_id() -> str:
    return f"call_{uuid.uuid4().hex[:24]}"


class _JsonScan:
    """Balanced-JSON-value scanner (string/escape aware)."""

    def __init__(self):
        self.depth = 0
        self.in_str = False
        self.esc = False
        self.started = False

    def feed(self, text: str) -> int:
        """Consume chars; returns the index AFTER the value completes, or
        -1 if still open."""
        for i, c in enumerate(text):
            if self.esc:
                self.esc = False
                continue
            if self.in_str:
                if c == "\\":
                    self.esc = True
                elif c == '"':
                    self.in_str = False
                continue
            if c == '"':
                self.in_str = True
                self.started = True
            elif c in "{[":
                self.depth += 1
                self.started = True
            elif c in "}]":
                self.depth -= 1
                if self.started and self.depth <= 0:
                    return i + 1
        return -1


def _held_marker_prefix(text: str, markers) -> int:
    """Length of the longest text suffix that is a proper prefix of some
    marker (must be held back until disambiguated)."""
    best = 0
    for m in markers:
        for k in range(min(len(m) - 1, len(text)), 0, -1):
            if text.endswith(m[:k]):
                best = max(best, k)
                break
    return best


class StreamingToolCallParser:
    """Feed text deltas; receive OpenAI chunk-delta dicts."""

    def __init__(self, at_message_start: bool = True):
        self.buf = ""
        self.state = "text"
        self.call_index = 0
        self.at_start = at_message_start
        # hermes incremental state
        self._outer = None
        self._args_scan = None
        self._args_from = None
        self._name_sent = False
        self._pending_args = ""
        self.saw_tool_call = False

    # ------------------------------------------------------------------
    def feed(self, delta: str) -> List[Dict[str, Any]]:
        self.buf += delta
        out: List[Dict[str, Any]] = []
        progress = True
        while progress:
            progress = False
            if self.state == "text":
                progress = self._feed_text(out)
            elif self.state == "hermes":
                progress = self._feed_hermes(out)
            elif self.state == "hermes_close":
                progress = self._feed_close(out)
            elif self.state == "buffered":
                progress = self._feed_buffered(out)
        return out

    def finish(self) -> List[Dict[str, Any]]:
        """Flush at end of stream (held prefixes, unfinished buffers)."""
        out: List[Dict[str, Any]] = []
        if self.state == "buffered":
            # never balanced: it was ordinary text after all
            self._emit_text(out, self.buf)
        elif self.buf and self.state in ("text", "hermes_close"):
            self._emit_text(out, self.buf)
        self.buf = ""
        return out

    # ------------------------------------------------------------------
    def _emit_text(self, out, text):
        if text:
            out.append({"content": text})

    def _feed_text(self, out) -> bool:
        i_h = self.buf.find(HERMES_OPEN)
        i_m = self.buf.find(MISTRAL_OPEN)
        starts = [(i, s) for i, s in ((i_h, "h"), (i_m, "m")) if i != -1]
        if starts:
            i, kind = min(starts)
            self._emit_text(out, self.buf[:i])
            if kind == "h":
                self.buf = self.buf[i + len(HERMES_OPEN):]
                self._begin_hermes()
            else:
                self.buf = self.buf[i + len(MISTRAL_OPEN):]
                self.state = "buffered"
            return True
        stripped = self.buf.lstrip()
        if self.at_start and stripped[:1] in ("{", "["):
            if MISTRAL_OPEN.startswith(stripped[: len(MISTRAL_OPEN)]):
                return False  # could still be the [TOOL_CALLS] marker: hold
            self.state = "buffered"
            return True
        hold = _held_marker_prefix(self.buf, (HERMES_OPEN, MISTRAL_OPEN))
        emit = self.buf[: len(self.buf) - hold]
        if emit:
            self.at_start = False
            self._emit_text(out, emit)
            self.buf = self.buf[len(emit):]
        return False

    # ------------------------------------------------------------------
    def _begin_hermes(self):
        self.state = "hermes"
        self.saw_tool_call = True
        self._outer = _JsonScan()
        self._outer_text = ""
        self._args_scan = None
        self._args_done = False
        self._args_pos = 0
        self._name_sent = False
        self._pending_args = ""

    def _tc(self, **fn) -> Dict[str, Any]:
        return {"tool_calls": [{"index": self.call_index, "function": fn}]}

    def _feed_hermes(self, out) -> bool:
        if not self.buf:
            return False
        end = self._outer.feed(self.buf)
        take = end if end != -1 else len(self.buf)
        self._outer_text += self.buf[:take]
        self.buf = self.buf[take:]

        # 1. name: emit the call-open delta as soon as it parses
        if not self._name_sent:
            m = _NAME_RE.search(self._outer_text)
            if m:
                self._name_sent = True
                out.append({
                    "tool_calls": [{
                        "index": self.call_index,
                        "id": _call_id(),
                        "type": "function",
                        "function": {
                            "name": json.loads(f'"{m.group(1)}"'),
                            "arguments": "",
                        },
                    }]
                })
                if self._pending_args:
                    out.append(self._tc(arguments=self._pending_args))
                    self._pending_args = ""

        # 2. arguments: stream the balanced value as raw fragments
        if self._args_scan is None:
            m = _ARGS_RE.search(self._outer_text)
            if m:
                self._args_scan = _JsonScan()
                self._args_pos = m.end()
        if self._args_scan is not None and not self._args_done:
            frag_src = self._outer_text[self._args_pos:]
            if frag_src:
                done = self._args_scan.feed(frag_src)
                frag = frag_src if done == -1 else frag_src[:done]
                self._args_pos += len(frag)
                if done != -1:
                    self._args_done = True
                if frag:
                    if self._name_sent:
                        out.append(self._tc(arguments=frag))
                    else:
                        self._pending_args += frag

        # 3. outer object complete -> strip the close tag, back to text
        if end != -1:
            if not self._name_sent:
                # degenerate call without a name: surface it as text
                self._emit_text(out, HERMES_OPEN + self._outer_text)
            self.call_index += 1
            self.state = "hermes_close"
            return True
        return False

    def _feed_close(self, out) -> bool:
        """Consume the (possibly still-arriving) ``</tool_call>`` tag."""
        s = self.buf.lstrip()
        if s.startswith(HERMES_CLOSE):
            self.buf = s[len(HERMES_CLOSE):]
            if self.buf.startswith("\n"):
                self.buf = self.buf[1:]
            self.state = "text"
            return True
        if not s or HERMES_CLOSE.startswith(s):
            return False  # could still become the close tag: hold
        self.state = "text"  # something else follows; keep whitespace? no —
        self.buf = s  # the tag was absent; drop the separator whitespace
        return True

    # ------------------------------------------------------------------
    def _feed_buffered(self, out) -> bool:
        scan = _JsonScan()
        end = scan.feed(self.buf)
        if end == -1:
            return False
        payload, rest = self.buf[:end], self.buf[end:]
        self.buf = rest
        self.state = "text"
        self.at_start = False
        try:
            obj = json.loads(payload)
        except json.JSONDecodeError:
            self._emit_text(out, payload)
            return True
        arr = obj if isinstance(obj, list) else [obj]
        emitted = False
        for o in arr:
            name = isinstance(o, dict) and o.get("name")
            if not name:
                continue
            args = o.get("arguments", o.get("parameters", {}))
            if not isinstance(args, str):
                args = json.dumps(args, ensure_ascii=False)
            out.append({
                "tool_calls": [{
                    "index": self.call_index,
                    "id": _call_id(),
                    "type": "function",
                    "function": {"name": name, "arguments": args},
                }]
            })
            self.call_index += 1
            emitted = True
            self.saw_tool_call = True
        if not emitted:
            self._emit_text(out, payload)
        return True
