"""Program tracing and compilation for the lang DSL.

Counterpart of the reference's `lang/tracer.py` (graph extraction by
running the program against a tracing state) and `lang/compiler.py`
(executing the extracted graph for batches without re-running Python).

`trace` runs the decorated function once with symbolic argument markers
and a TracingState that records every primitive instead of calling a
backend; the result is a flat node program (text / gen / select / role
boundaries / image).  Control flow that branches on *generated* values
cannot be traced (same restriction as the reference) — gen/select return
opaque markers.

`CompiledFunction.run(**args)` replays the node program against a real
backend, substituting argument markers; `run_batch` maps it over many
argument dicts concurrently (branches share the radix-cached prompt
prefix server-side).
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import Any, Dict, List, Optional

from sglang_npu_tpu.lang.api import (
    ProgramState,
    SglGen,
    SglImage,
    SglMessage,
    SglSelect,
)

ARG_L, ARG_R = "⟦arg:", "⟧"  # ⟦arg:name⟧
GEN_L, GEN_R = "⟦gen:", "⟧"


def _arg_marker(name: str) -> str:
    return f"{ARG_L}{name}{ARG_R}"


# ----------------------------------------------------------------------
@dataclasses.dataclass
class TextNode:
    text: str


@dataclasses.dataclass
class GenNode:
    name: Optional[str]
    spec: SglGen


@dataclasses.dataclass
class SelectNode:
    name: Optional[str]
    spec: SglSelect


@dataclasses.dataclass
class RoleNode:
    role: str
    begin: bool


@dataclasses.dataclass
class ImageNode:
    arg: str  # argument marker or literal data
    placeholder: str


@dataclasses.dataclass
class TracedProgram:
    name: str
    arg_names: List[str]
    nodes: List[Any]

    def graph(self) -> str:
        """Human-readable node listing (reference trace printout)."""
        lines = [f"program {self.name}({', '.join(self.arg_names)})"]
        for n in self.nodes:
            if isinstance(n, TextNode):
                lines.append(f"  text  {n.text!r}")
            elif isinstance(n, GenNode):
                lines.append(f"  gen   name={n.name}")
            elif isinstance(n, SelectNode):
                lines.append(
                    f"  select name={n.name} choices={n.spec.choices}"
                )
            elif isinstance(n, RoleNode):
                lines.append(
                    f"  {'begin' if n.begin else 'end'}_role {n.role}"
                )
            elif isinstance(n, ImageNode):
                lines.append(f"  image {n.arg!r}")
        return "\n".join(lines)


class TracingState(ProgramState):
    """Records primitives instead of executing them."""

    def __init__(self):
        super().__init__(backend=None)
        self.nodes: List[Any] = []

    def _append_text(self, t: str):
        super()._append_text(t)
        if self.nodes and isinstance(self.nodes[-1], TextNode):
            self.nodes[-1].text += t
        else:
            self.nodes.append(TextNode(t))

    def _run_gen(self, g: SglGen):
        self.nodes.append(GenNode(g.name, g))
        marker = f"{GEN_L}{g.name or len(self.nodes)}{GEN_R}"
        if g.name:
            self.variables[g.name] = marker
        super()._append_text(marker)  # keep prompt text coherent, unrecorded

    def _run_select(self, sel: SglSelect):
        self.nodes.append(SelectNode(sel.name, sel))
        marker = f"{GEN_L}{sel.name or len(self.nodes)}{GEN_R}"
        if sel.name:
            self.variables[sel.name] = marker
        super()._append_text(marker)

    def append(self, other):
        if isinstance(other, SglMessage):
            self.chat_mode = True
            self.nodes.append(RoleNode(other.role, True))
            self._cur_role = other.role
            self.messages.append({"role": other.role, "content": ""})
            for part in other.parts:
                self.append(part)
            self.nodes.append(RoleNode(other.role, False))
            self._cur_role = None
        elif isinstance(other, SglImage):
            self.nodes.append(ImageNode(other.data, other.placeholder))
            super()._append_text(other.placeholder)
        else:
            super().append(other)


def trace(fn, name: str) -> TracedProgram:
    sig = inspect.signature(fn)
    arg_names = [p for p in sig.parameters][1:]  # drop the state arg
    state = TracingState()
    fn(state, *[_arg_marker(a) for a in arg_names])
    return TracedProgram(name=name, arg_names=arg_names, nodes=state.nodes)


# ----------------------------------------------------------------------
class CompiledFunction:
    """Replay a TracedProgram against a backend (reference
    `lang/compiler.py CompiledFunction`)."""

    def __init__(self, program: TracedProgram):
        self.program = program

    def _subst(self, text: str, args: Dict[str, Any]) -> str:
        for k, v in args.items():
            text = text.replace(_arg_marker(k), str(v))
        return text

    def run(self, *, backend=None, **kwargs) -> ProgramState:
        from sglang_npu_tpu.lang import api as _api

        backend = backend or _api._default_backend
        if backend is None:
            raise RuntimeError(
                "no backend: pass backend= or set_default_backend()"
            )
        state = ProgramState(backend)
        missing = [a for a in self.program.arg_names if a not in kwargs]
        if missing:
            raise TypeError(f"missing arguments: {missing}")
        role: Optional[str] = None
        for n in self.program.nodes:
            if isinstance(n, TextNode):
                state.append(self._subst(n.text, kwargs))
            elif isinstance(n, RoleNode):
                if n.begin:
                    state.chat_mode = True
                    state._cur_role = n.role
                    state.messages.append({"role": n.role, "content": ""})
                else:
                    state._cur_role = None
            elif isinstance(n, GenNode):
                state._run_gen(n.spec)
            elif isinstance(n, SelectNode):
                state._run_select(n.spec)
            elif isinstance(n, ImageNode):
                data = kwargs.get(
                    n.arg[len(ARG_L):-len(ARG_R)], n.arg
                ) if isinstance(n.arg, str) and n.arg.startswith(ARG_L) else n.arg
                state.append(SglImage(data, n.placeholder))
        return state

    def run_batch(
        self, arg_dicts: List[Dict[str, Any]], *, backend=None,
        max_workers: int = 16,
    ) -> List[ProgramState]:
        import concurrent.futures as _cf

        if len(arg_dicts) <= 1:
            return [self.run(backend=backend, **d) for d in arg_dicts]
        with _cf.ThreadPoolExecutor(
            min(max_workers, len(arg_dicts))
        ) as pool:
            return list(
                pool.map(lambda d: self.run(backend=backend, **d), arg_dicts)
            )
