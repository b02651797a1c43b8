"""Per-model tool-call format detectors.

Counterpart of the reference's detector registry
(`srt/function_call/function_call_parser.py ToolCallParserEnum` and the
per-model detector files: deepseekv3, llama32, mistral, qwen25, pythonic,
kimik2, glm4_moe, step3, qwen3_coder).  Each detector knows one model
family's tool-call wire format and converts it to OpenAI tool_calls
entries.  A generic buffered streaming adapter turns any detector into an
incremental parser for SSE streaming (the hermes/mistral/bare-JSON default
path keeps the fully-incremental `streaming.StreamingToolCallParser`).

Formats (behavioral spec from the reference files):
  llama3       ``<|python_tag|>{json};{json}`` or a bare leading JSON object
  qwen25       ``<tool_call>\n{json}\n</tool_call>`` (hermes)
  mistral      ``[TOOL_CALLS] [{...}, ...]``
  deepseekv3   ``<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>fn<｜tool▁sep｜>name
               \\n```json\\n{...}\\n```<｜tool▁call▁end｜>...<｜tool▁calls▁end｜>``
  pythonic     ``[fn(a=1, b="x"), other(c=[2])]`` (llama-4; ast-parsed)
  kimi_k2      ``<|tool_calls_section_begin|><|tool_call_begin|>
               functions.name:idx<|tool_call_argument_begin|>{...}
               <|tool_call_end|><|tool_calls_section_end|>``
  glm45        ``<tool_call>name\\n<arg_key>k</arg_key><arg_value>v</arg_value>
               ...</tool_call>``
  step3        ``<｜tool_calls_begin｜><｜tool_call_begin｜>function<｜tool_sep｜>
               <steptml:invoke name="n"><steptml:parameter name="p">v
               </steptml:parameter></steptml:invoke><｜tool_call_end｜>...``
  qwen3_coder  ``<tool_call><function=name><parameter=key>value</parameter>
               </function></tool_call>``
"""

from __future__ import annotations

import ast
import json
import re
import uuid
from typing import Any, Dict, List, Optional, Sequence, Tuple


def _call_id() -> str:
    return f"call_{uuid.uuid4().hex[:24]}"


def _mk_call(name: str, arguments: Any) -> Dict[str, Any]:
    if not isinstance(arguments, str):
        arguments = json.dumps(arguments, ensure_ascii=False)
    return {
        "id": _call_id(),
        "type": "function",
        "function": {"name": name, "arguments": arguments},
    }


def _tool_param_type(tools, func_name: str, key: str) -> Optional[str]:
    """Look up a parameter's declared JSON-schema type in the request tools."""
    for t in tools or []:
        fn = t.get("function", t) if isinstance(t, dict) else None
        if not fn or fn.get("name") != func_name:
            continue
        props = (fn.get("parameters") or {}).get("properties") or {}
        spec = props.get(key) or {}
        return spec.get("type")
    return None


def _parse_loose(value: str) -> Tuple[Any, bool]:
    """json.loads, then ast.literal_eval; (value, False) if neither parses."""
    try:
        return json.loads(value), True
    except Exception:
        pass
    try:
        return ast.literal_eval(value), True
    except Exception:
        return value, False


class ToolCallDetector:
    """One model family's tool-call format.

    `detect_and_parse` is the one-shot API: full text -> (normal_text,
    calls) where calls are OpenAI tool_calls dicts.  `markers` lists the
    literal strings whose appearance can begin a tool-call region (used by
    the streaming adapter to hold back partial markers).
    """

    name = "base"
    markers: Sequence[str] = ()
    #: characters that can begin a markerless call at message start
    #: (llama3 bare JSON object "{", pythonic call list "[")
    start_chars: Sequence[str] = ()

    def has_tool_call(self, text: str) -> bool:
        return any(m in text for m in self.markers)

    def detect_and_parse(
        self, text: str, tools: Optional[list] = None
    ) -> Tuple[str, List[Dict[str, Any]]]:
        raise NotImplementedError

    def streaming(self) -> "DetectorStream":
        return DetectorStream(self)


class Llama32Detector(ToolCallDetector):
    """``<|python_tag|>`` + ";"-separated JSON objects, or a bare leading
    JSON object (reference llama32_detector.py:36-82)."""

    name = "llama3"
    markers = ("<|python_tag|>",)
    start_chars = ("{",)
    separator = ";"

    def has_tool_call(self, text: str) -> bool:
        return "<|python_tag|>" in text or text.lstrip().startswith("{")

    def detect_and_parse(self, text, tools=None):
        if "<|python_tag|>" in text:
            normal, action = text.split("<|python_tag|>", 1)
        elif text.lstrip().startswith("{"):
            normal, action = "", text.lstrip()
        else:
            return text, []
        decoder = json.JSONDecoder()
        idx = 0
        safe_idx = 0
        objs = []
        while idx < len(action):
            try:
                obj, end = decoder.raw_decode(action[idx:])
                objs.append(obj)
                idx += end
                safe_idx = idx
                # skip the separator (and surrounding whitespace)
                while idx < len(action) and action[idx] in " \n\t":
                    idx += 1
                if action[idx : idx + 1] == self.separator:
                    idx += 1
            except json.JSONDecodeError:
                nxt = action.find('{"name"', idx + 1)
                if nxt == -1:
                    break
                idx = nxt
        calls = []
        for o in objs:
            if isinstance(o, dict) and o.get("name"):
                calls.append(
                    _mk_call(o["name"], o.get("arguments", o.get("parameters", {})))
                )
        if not calls:
            return text, []
        trailing = action[safe_idx:].strip()
        return (normal + trailing).strip(), calls


class Qwen25Detector(ToolCallDetector):
    """Hermes-style ``<tool_call>{json}</tool_call>`` blocks
    (reference qwen25_detector.py)."""

    name = "qwen25"
    markers = ("<tool_call>",)
    _block = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>", re.DOTALL)

    def detect_and_parse(self, text, tools=None):
        calls = []
        for b in self._block.findall(text):
            try:
                o = json.loads(b)
            except json.JSONDecodeError:
                continue
            if isinstance(o, dict) and o.get("name"):
                calls.append(
                    _mk_call(o["name"], o.get("arguments", o.get("parameters", {})))
                )
        if not calls:
            return text, []
        return self._block.sub("", text).strip(), calls


class MistralDetector(ToolCallDetector):
    """``[TOOL_CALLS] [{...}, ...]`` (reference mistral_detector.py)."""

    name = "mistral"
    markers = ("[TOOL_CALLS]",)

    def detect_and_parse(self, text, tools=None):
        idx = text.find("[TOOL_CALLS]")
        if idx == -1:
            return text, []
        payload = text[idx + len("[TOOL_CALLS]") :].strip()
        try:
            arr, _end = json.JSONDecoder().raw_decode(payload)
        except json.JSONDecodeError:
            return text, []
        if isinstance(arr, dict):
            arr = [arr]
        calls = [
            _mk_call(o["name"], o.get("arguments", o.get("parameters", {})))
            for o in arr
            if isinstance(o, dict) and o.get("name")
        ]
        if not calls:
            return text, []
        return text[:idx].strip(), calls


class DeepSeekV3Detector(ToolCallDetector):
    """Unicode-fenced calls with a ```json``` argument block
    (reference deepseekv3_detector.py:48-87)."""

    name = "deepseekv3"
    markers = ("<｜tool▁calls▁begin｜>",)
    _call = re.compile(r"<｜tool▁call▁begin｜>.*?<｜tool▁call▁end｜>", re.DOTALL)
    _detail = re.compile(
        r"<｜tool▁call▁begin｜>(.*)<｜tool▁sep｜>(.*?)\n```json\n(.*)\n```"
        r"\s*<｜tool▁call▁end｜>",
        re.DOTALL,
    )

    def detect_and_parse(self, text, tools=None):
        idx = text.find(self.markers[0])
        if idx == -1:
            return text, []
        calls = []
        for block in self._call.findall(text):
            m = self._detail.search(block)
            if not m:
                continue
            try:
                args = json.loads(m.group(3))
            except json.JSONDecodeError:
                continue
            calls.append(_mk_call(m.group(2).strip(), args))
        if not calls:
            return text[:idx].strip(), []
        return text[:idx].strip(), calls


class PythonicDetector(ToolCallDetector):
    """Python-expression call list ``[fn(a=1), g(b="x")]`` (llama-4;
    reference pythonic_detector.py:36-109)."""

    name = "pythonic"
    markers = ("<|python_start|>",)
    start_chars = ("[",)
    _list = re.compile(
        r"\[\s*[a-zA-Z_]\w*\s*\((?:[^()\[\]]|\([^()]*\)|\[[^\[\]]*\])*\)"
        r"(?:\s*,\s*[a-zA-Z_]\w*\s*\((?:[^()\[\]]|\([^()]*\)|\[[^\[\]]*\])*\))*\s*\]",
        re.DOTALL,
    )

    @staticmethod
    def _strip(text: str) -> str:
        return text.replace("<|python_start|>", "").replace("<|python_end|>", "")

    def has_tool_call(self, text: str) -> bool:
        return bool(self._list.search(self._strip(text.strip())))

    def detect_and_parse(self, text, tools=None):
        src = self._strip(text.strip())
        m = self._list.search(src)
        if m is None:
            return text, []
        normal = (src[: m.start()] + src[m.end() :]).strip()
        try:
            module = ast.parse(m.group(0), mode="eval")
            parsed = module.body
            if not (
                isinstance(parsed, ast.List)
                and all(isinstance(e, ast.Call) for e in parsed.elts)
            ):
                return normal, []
        except SyntaxError:
            return text, []
        calls = []
        for call in parsed.elts:
            if not isinstance(call.func, ast.Name):
                continue
            args = {}
            for kw in call.keywords:
                try:
                    args[kw.arg] = ast.literal_eval(kw.value)
                except (ValueError, SyntaxError):
                    args[kw.arg] = ast.unparse(kw.value)
            calls.append(_mk_call(call.func.id, args))
        if not calls:
            return normal, []
        return normal, calls


class KimiK2Detector(ToolCallDetector):
    """``functions.name:index`` call ids with argument sections
    (reference kimik2_detector.py:37-92)."""

    name = "kimi_k2"
    markers = ("<|tool_calls_section_begin|>",)
    _call = re.compile(
        r"<\|tool_call_begin\|>\s*(?P<id>[\w\.]+:\d+)\s*"
        r"<\|tool_call_argument_begin\|>\s*(?P<args>\{.*?\})\s*<\|tool_call_end\|>",
        re.DOTALL,
    )

    def detect_and_parse(self, text, tools=None):
        idx = text.find(self.markers[0])
        if idx == -1:
            return text, []
        calls = []
        for m in self._call.finditer(text):
            fid = m.group("id")  # e.g. functions.get_weather:0
            try:
                fname = fid.split(".", 1)[1].split(":", 1)[0]
            except IndexError:
                fname = fid.split(":", 1)[0]
            calls.append(_mk_call(fname, m.group("args")))
        return text[:idx].strip(), calls


class Glm45Detector(ToolCallDetector):
    """GLM-4.5 ``<arg_key>/<arg_value>`` pair format
    (reference glm4_moe_detector.py:49-99)."""

    name = "glm45"
    markers = ("<tool_call>",)
    _call = re.compile(r"<tool_call>.*?</tool_call>", re.DOTALL)
    _detail = re.compile(r"<tool_call>([^\n<]*)\n(.*)</tool_call>", re.DOTALL)
    _pair = re.compile(
        r"<arg_key>(.*?)</arg_key>\s*<arg_value>(.*?)</arg_value>", re.DOTALL
    )

    def detect_and_parse(self, text, tools=None):
        idx = text.find("<tool_call>")
        if idx == -1:
            return text, []
        calls = []
        for block in self._call.findall(text):
            m = self._detail.search(block)
            if not m:
                continue
            fname = m.group(1).strip()
            args = {}
            for k, v in self._pair.findall(m.group(2)):
                k, v = k.strip(), v.strip()
                if _tool_param_type(tools, fname, k) != "string":
                    v, _ok = _parse_loose(v)
                args[k] = v
            calls.append(_mk_call(fname, args))
        if not calls:
            return text, []
        return text[:idx].strip(), calls


class Step3Detector(ToolCallDetector):
    """steptml XML invocations inside unicode fences
    (reference step3_detector.py:64-160)."""

    name = "step3"
    markers = ("<｜tool_calls_begin｜>",)
    _call = re.compile(
        r"<｜tool_call_begin｜>(.*?)<｜tool_call_end｜>", re.DOTALL
    )
    _invoke = re.compile(
        r'<steptml:invoke\s+name="([^"]+)">(.*?)</steptml:invoke>', re.DOTALL
    )
    _param = re.compile(
        r'<steptml:parameter\s+name="([^"]+)">(.*?)</steptml:parameter>', re.DOTALL
    )

    def detect_and_parse(self, text, tools=None):
        idx = text.find(self.markers[0])
        if idx == -1:
            return text, []
        calls = []
        for block in self._call.findall(text):
            m = self._invoke.search(block)
            if not m:
                continue
            fname = m.group(1)
            args = {}
            for k, v in self._param.findall(m.group(2)):
                k, v = k.strip(), v.strip()
                if _tool_param_type(tools, fname, k) != "string":
                    v, _ok = _parse_loose(v)
                args[k] = v
            calls.append(_mk_call(fname, args))
        return text[:idx].strip(), calls


class Qwen3CoderDetector(ToolCallDetector):
    """XML ``<function=name><parameter=key>`` format
    (reference qwen3_coder_detector.py:31-120)."""

    name = "qwen3_coder"
    markers = ("<tool_call>",)
    _call = re.compile(r"<tool_call>(.*?)</tool_call>", re.DOTALL)
    _func = re.compile(r"<function=([^>\n]+)>(.*?)</function>", re.DOTALL)
    _param = re.compile(r"<parameter=([^>\n]+)>(.*?)</parameter>", re.DOTALL)

    def detect_and_parse(self, text, tools=None):
        idx = text.find("<tool_call>")
        if idx == -1:
            return text, []
        calls = []
        for block in self._call.findall(text):
            fm = self._func.search(block)
            if not fm:
                continue
            fname = fm.group(1).strip()
            args = {}
            for k, v in self._param.findall(fm.group(2)):
                k = k.strip()
                v = v.strip("\n")
                if _tool_param_type(tools, fname, k) != "string":
                    parsed, ok = _parse_loose(v)
                    v = parsed if ok else v
                args[k] = v
            calls.append(_mk_call(fname, args))
        if not calls:
            return text, []
        return text[:idx].strip(), calls


DETECTORS: Dict[str, type] = {
    d.name: d
    for d in (
        Llama32Detector,
        Qwen25Detector,
        MistralDetector,
        DeepSeekV3Detector,
        PythonicDetector,
        KimiK2Detector,
        Glm45Detector,
        Step3Detector,
        Qwen3CoderDetector,
    )
}


def get_detector(name: Optional[str]) -> Optional[ToolCallDetector]:
    cls = DETECTORS.get(name or "")
    return cls() if cls else None


# ---------------------------------------------------------------------------
# Streaming adapter
# ---------------------------------------------------------------------------


class DetectorStream:
    """Buffered streaming adapter over any ToolCallDetector.

    Text before the first marker streams immediately (with marker-prefix
    hold-back so tags never leak).  From the marker on, the output buffers;
    every feed re-parses and emits newly-completed calls as OpenAI deltas
    (name-opening delta with id, then one arguments delta).  `finish()`
    flushes: if nothing ever parsed, the buffer was ordinary text.

    Same delta dict shape as `streaming.StreamingToolCallParser`.
    """

    def __init__(self, detector: ToolCallDetector, tools: Optional[list] = None):
        self.det = detector
        self.tools = tools
        self.buf = ""
        self.in_tool = False
        self.tool_buf = ""
        self.emitted = 0
        self.saw_tool_call = False
        self.at_start = True

    # -- delta constructors -------------------------------------------------
    def _text(self, out, text):
        if text:
            out.append({"content": text})

    def _emit_call(self, out, call, index):
        fn = call["function"]
        out.append(
            {
                "tool_calls": [
                    {
                        "index": index,
                        "id": call["id"],
                        "type": "function",
                        "function": {"name": fn["name"], "arguments": ""},
                    }
                ]
            }
        )
        if fn["arguments"]:
            out.append(
                {
                    "tool_calls": [
                        {"index": index, "function": {"arguments": fn["arguments"]}}
                    ]
                }
            )
        self.saw_tool_call = True

    # -- marker scanning ----------------------------------------------------
    def _held_prefix_len(self) -> int:
        best = 0
        for m in self.det.markers:
            for k in range(min(len(m) - 1, len(self.buf)), 0, -1):
                if self.buf.endswith(m[:k]):
                    best = max(best, k)
                    break
        return best

    def feed(self, delta: str) -> List[Dict[str, Any]]:
        out: List[Dict[str, Any]] = []
        if self.in_tool:
            self.tool_buf += delta
            self._try_parse(out)
            return out
        self.buf += delta
        # earliest marker occurrence?
        hits = [(self.buf.find(m), m) for m in self.det.markers]
        hits = [(i, m) for i, m in hits if i != -1]
        if hits:
            i, _m = min(hits)
            self._text(out, self.buf[:i])
            self.tool_buf = self.buf[i:]
            self.buf = ""
            self.in_tool = True
            self._try_parse(out)
            return out
        stripped = self.buf.lstrip()
        if self.at_start and stripped[:1] in tuple(self.det.start_chars):
            self.tool_buf = self.buf
            self.buf = ""
            self.in_tool = True
            self._try_parse(out)
            return out
        hold = self._held_prefix_len()
        emit = self.buf[: len(self.buf) - hold]
        if emit:
            self.at_start = False
            self._text(out, emit)
            self.buf = self.buf[len(emit) :]
        return out

    def _try_parse(self, out):
        _normal, calls = self.det.detect_and_parse(self.tool_buf, self.tools)
        for i in range(self.emitted, len(calls)):
            self._emit_call(out, calls[i], i)
        self.emitted = max(self.emitted, len(calls))

    def finish(self) -> List[Dict[str, Any]]:
        out: List[Dict[str, Any]] = []
        if self.in_tool:
            normal, calls = self.det.detect_and_parse(self.tool_buf, self.tools)
            for i in range(self.emitted, len(calls)):
                self._emit_call(out, calls[i], i)
            if calls:
                self._text(out, normal if self.emitted == 0 else "")
            else:
                self._text(out, self.tool_buf)
        elif self.buf:
            self._text(out, self.buf)
        self.buf = self.tool_buf = ""
        return out
