"""Frontend structured-generation DSL.

Counterpart of the reference's `python/sglang/lang/` + `api.py`
(`@sgl.function`, `sgl.gen/select/system/user/assistant`,
`SglFunction.run/run_batch`, interpreter, RuntimeEndpoint backend): programs
compose chat turns and generation calls; consecutive calls share KV through
the engine's radix prefix cache, which is what makes multi-call programs
fast (the RadixAttention paper's motivating workload).

Round-1 scope: sequential interpreter (no parallel forks), Engine and HTTP
backends, token-length-normalized `select` scoring (reference
`lang/choices.py`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Union

_default_backend = None


def set_default_backend(backend) -> None:
    global _default_backend
    _default_backend = backend


# ----------------------------------------------------------------------
# Primitives
# ----------------------------------------------------------------------
@dataclasses.dataclass
class SglGen:
    name: Optional[str] = None
    max_tokens: int = 128
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    stop: Optional[Union[str, List[str]]] = None
    regex: Optional[str] = None
    json_schema: Optional[str] = None
    ignore_eos: bool = False


@dataclasses.dataclass
class SglSelect:
    name: Optional[str]
    choices: List[str]
    method: str = "token_length_normalized"


@dataclasses.dataclass
class SglMessage:
    role: str
    parts: List[Any]


@dataclasses.dataclass
class SglImage:
    """An image in the prompt (reference `sgl.image`).  ``data`` is
    anything the multimodal processor accepts (path, bytes, base64,
    data: URI, PIL); ``placeholder`` is the model's image-token string
    inserted into the prompt text (e.g. qwen2.5-vl
    ``<|vision_start|><|image_pad|><|vision_end|>``, llava ``<image>``)."""

    data: Any
    placeholder: str = "<image>"


def gen(name: Optional[str] = None, **kwargs) -> SglGen:
    return SglGen(name=name, **kwargs)


def select(name: Optional[str] = None, choices: List[str] = (), method="token_length_normalized") -> SglSelect:
    return SglSelect(name=name, choices=list(choices), method=method)


def image(data, placeholder: str = "<image>") -> SglImage:
    return SglImage(data, placeholder)


def system(*parts) -> SglMessage:
    return SglMessage("system", list(parts))


def user(*parts) -> SglMessage:
    return SglMessage("user", list(parts))


def assistant(*parts) -> SglMessage:
    return SglMessage("assistant", list(parts))


# ----------------------------------------------------------------------
# Program state / interpreter
# ----------------------------------------------------------------------
class ProgramState:
    def __init__(self, backend):
        self.backend = backend
        self.messages: List[Dict[str, str]] = []
        self.text = ""  # completion-mode accumulation
        self.chat_mode = False
        self.variables: Dict[str, str] = {}
        self.image_data: List[Any] = []
        self._cur_role: Optional[str] = None

    # s += <thing>
    def __iadd__(self, other):
        self.append(other)
        return self

    def append(self, other):
        if isinstance(other, str):
            self._append_text(other)
        elif isinstance(other, SglGen):
            self._run_gen(other)
        elif isinstance(other, SglSelect):
            self._run_select(other)
        elif isinstance(other, SglImage):
            self.image_data.append(other.data)
            self._append_text(other.placeholder)
        elif isinstance(other, SglMessage):
            self.chat_mode = True
            self._cur_role = other.role
            self.messages.append({"role": other.role, "content": ""})
            for part in other.parts:
                self.append(part)
            self._cur_role = None
        else:
            raise TypeError(f"cannot append {type(other)} to program state")

    def _append_text(self, t: str):
        if self.chat_mode and self.messages:
            self.messages[-1]["content"] += t
        else:
            self.text += t

    # ------------------------------------------------------------------
    def _render_prompt(self) -> str:
        if not self.chat_mode:
            return self.text
        from sglang_npu_tpu.entrypoints.openai.serving_chat import (
            apply_chat_template,
        )

        # if mid-assistant turn, render with generation prompt + partial
        msgs = self.messages
        if msgs and msgs[-1]["role"] == "assistant":
            prefix, _ = apply_chat_template(
                self.backend.tokenizer, msgs[:-1], add_generation_prompt=True
            )
            return prefix + msgs[-1]["content"]
        return apply_chat_template(
            self.backend.tokenizer, msgs, add_generation_prompt=True
        )[0]

    def _run_gen(self, g: SglGen):
        prompt = self._render_prompt()
        out = self.backend.generate(
            prompt,
            {
                "max_new_tokens": g.max_tokens,
                "temperature": g.temperature,
                "top_p": g.top_p,
                "top_k": g.top_k,
                "stop": g.stop,
                "regex": g.regex,
                "json_schema": g.json_schema,
                "ignore_eos": g.ignore_eos,
            },
            image_data=self.image_data or None,
        )
        if g.name:
            self.variables[g.name] = out
        self._append_text(out)

    def _run_select(self, sel: SglSelect):
        from sglang_npu_tpu.lang.choices import CHOICES_METHODS

        method = CHOICES_METHODS.get(sel.method)
        if method is None:
            raise ValueError(f"unknown select method {sel.method!r}")
        prompt = self._render_prompt()
        token_logprobs = [
            self.backend.score(prompt, choice) for choice in sel.choices
        ]
        uncond = None
        if method.requires_unconditional_logprobs:
            uncond = [self.backend.score("", c) for c in sel.choices]
        decision = method(
            choices=list(sel.choices),
            token_logprobs=token_logprobs,
            unconditional_logprobs=uncond,
        )
        choice = decision.decision
        if sel.name:
            self.variables[sel.name] = choice
            self.variables[f"{sel.name}_meta"] = decision.meta_info
        self._append_text(choice)

    def __getitem__(self, name: str) -> str:
        return self.variables[name]

    def text_output(self) -> str:
        return self.text if not self.chat_mode else str(self.messages)

    # ------------------------------------------------------------------
    def _clone(self) -> "ProgramState":
        import copy as _copy

        c = ProgramState(self.backend)
        c.messages = _copy.deepcopy(self.messages)
        c.text = self.text
        c.chat_mode = self.chat_mode
        c.variables = dict(self.variables)
        c._cur_role = self._cur_role
        return c

    def fork(self, n: int) -> "ForkedStates":
        """Fork the state into ``n`` independent branches (reference
        `sglang.lang` fork): each branch owns a copy of the prompt so
        far; branches sharing the parent prefix hit the radix cache on
        the server side, so forked generations reuse the common KV."""
        return ForkedStates([self._clone() for _ in range(n)])


class ForkedStates:
    """The branches returned by `ProgramState.fork` (reference
    `SglFork`): index/iterate to drive each branch, or `map` a program
    fragment over all branches concurrently."""

    def __init__(self, states: List["ProgramState"]):
        self.states = states

    def __len__(self):
        return len(self.states)

    def __getitem__(self, i: int) -> "ProgramState":
        return self.states[i]

    def __iter__(self):
        return iter(self.states)

    def map(self, fn, parallel: bool = True) -> "ForkedStates":
        """Run ``fn(state, index)`` on every branch — concurrently by
        default (the engine batches the overlapping requests; the shared
        parent prefix is one radix-cache entry)."""
        import concurrent.futures as _cf

        if not parallel or len(self.states) <= 1:
            for i, s in enumerate(self.states):
                fn(s, i)
            return self
        with _cf.ThreadPoolExecutor(len(self.states)) as pool:
            list(pool.map(lambda t: fn(t[1], t[0]), enumerate(self.states)))
        return self


class SglFunction:
    def __init__(self, fn):
        self.fn = fn
        functools.update_wrapper(self, fn)

    def run(self, *args, backend=None, **kwargs) -> ProgramState:
        backend = backend or _default_backend
        if backend is None:
            raise RuntimeError("no backend: pass backend= or set_default_backend()")
        s = ProgramState(backend)
        self.fn(s, *args, **kwargs)
        return s

    def run_batch(
        self,
        batch_kwargs: List[Dict[str, Any]],
        backend=None,
        num_threads: int = 8,
    ):
        """Run the program over a batch of inputs — concurrently, so the
        engine's continuous batching overlaps them (reference
        `SglFunction.run_batch` with its thread executor)."""
        if num_threads <= 1 or len(batch_kwargs) <= 1:
            return [self.run(backend=backend, **kw) for kw in batch_kwargs]
        import concurrent.futures as _cf

        with _cf.ThreadPoolExecutor(
            min(num_threads, len(batch_kwargs))
        ) as pool:
            futs = [
                pool.submit(self.run, backend=backend, **kw)
                for kw in batch_kwargs
            ]
            return [f.result() for f in futs]

    def trace(self):
        """Extract the program's node graph without touching a backend
        (reference `SglFunction.trace`, lang/tracer.py)."""
        from sglang_npu_tpu.lang.tracer import trace as _trace

        return _trace(self.fn, getattr(self.fn, "__name__", "program"))

    def compile(self):
        """Trace once and return a replayable CompiledFunction (reference
        `SglFunction.compile`, lang/compiler.py)."""
        from sglang_npu_tpu.lang.tracer import CompiledFunction

        return CompiledFunction(self.trace())

    def __call__(self, *args, **kwargs):
        return self.run(*args, **kwargs)


def function(fn) -> SglFunction:
    return SglFunction(fn)


# ----------------------------------------------------------------------
# Backends
# ----------------------------------------------------------------------
class EngineBackend:
    """In-process backend over `sglang_npu_tpu.Engine`."""

    def __init__(self, engine):
        self.engine = engine
        self.tokenizer = engine.tokenizer

    def generate(
        self, prompt: str, sampling_params: Dict[str, Any], image_data=None
    ) -> str:
        out = self.engine.generate(
            prompt, sampling_params, image_data=image_data
        )
        return out["text"]

    def score(self, prompt: str, continuation: str) -> List[float]:
        """Per-token logprobs of the continuation given the prompt."""
        ids_p = self.tokenizer.encode(prompt) if prompt else []
        ids_full = self.tokenizer.encode(prompt + continuation)
        out = self.engine.generate(
            input_ids=ids_full,
            sampling_params={"max_new_tokens": 0, "temperature": 0.0},
            return_logprob=True,
            logprob_start_len=len(ids_p),
        )
        entries = out["meta_info"].get("input_token_logprobs", [])
        return [e[0] for e in entries]


class RuntimeEndpoint:
    """HTTP backend against a running server (reference
    `lang/backend/runtime_endpoint.py`)."""

    def __init__(self, base_url: str, timeout: float = 600.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.tokenizer = None  # server-side tokenization

    def _post(self, path, payload):
        import json as _json
        import urllib.request

        req = urllib.request.Request(
            self.base_url + path,
            data=_json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return _json.loads(resp.read())

    def generate(
        self, prompt: str, sampling_params: Dict[str, Any], image_data=None
    ) -> str:
        payload = {"text": prompt, "sampling_params": sampling_params}
        if image_data:
            payload["image_data"] = image_data
        out = self._post("/generate", payload)
        return out["text"]

    def score(self, prompt: str, continuation: str) -> List[float]:
        out = self._post(
            "/generate",
            {
                "text": prompt + continuation,
                "sampling_params": {"max_new_tokens": 0, "temperature": 0.0},
                "return_logprob": True,
                "logprob_start_len": 0,
            },
        )
        entries = out["meta_info"].get("input_token_logprobs", [])
        # approximate: server-side tokenization of the prompt alone is
        # unknown; score the full sequence (consistent across choices
        # sharing the prompt prefix)
        return [e[0] for e in entries]
