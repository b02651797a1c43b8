"""Structural-tag constrained decoding.

Counterpart of the reference's structural-tag grammars
(`constrained/xgrammar_backend.py dispatch_structural_tag`, OpenAI
`response_format: structural_tag`): free text is UNCONSTRAINED until the
model emits one of the trigger strings; from there the output must
complete one of the structures whose ``begin`` starts with that trigger —
``begin`` + JSON body matching ``schema`` + ``end`` — after which free
text resumes (repeatably).

Spec (JSON):
    {"structures": [{"begin": "<function=f>", "schema": {...},
                     "end": "</function>"}],
     "triggers": ["<function="]}

Implementation: a composite grammar object (same interface as
`grammar_backend.FsmGrammar`).  Free mode tracks a rolling byte tail to
detect triggers; structured mode runs a byte DFA compiled from
``escape(begin minus trigger) + json_regex(schema) + escape(end)`` for all
structures sharing the trigger.  When that DFA reaches accept, the object
returns to free mode.  Host-side only (no dense device tables): the
scheduler uses the per-token mask path for these requests.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Tuple

import numpy as np

from sglang_npu_tpu.constrained.json_schema import build_json_regex
from sglang_npu_tpu.constrained.regex_engine import LazyDFA

_META = set("()[].\\*+?{}|")


def _escape(text: str) -> str:
    return "".join("\\" + c if c in _META else c for c in text)


class StructuralTagGrammar:
    """Per-request structural-tag state (FsmGrammar interface)."""

    device = None  # host path only

    def __init__(self, spec: str, vocab):
        cfg = json.loads(spec) if isinstance(spec, str) else spec
        structures = cfg.get("structures") or []
        triggers = cfg.get("triggers") or []
        if not structures or not triggers:
            raise ValueError(
                "structural_tag needs non-empty structures and triggers"
            )
        self.vocab = vocab
        # one continuation DFA per trigger: alternation over the structures
        # whose begin starts with that trigger (begin minus the trigger)
        self.trigger_bytes: List[bytes] = []
        self.dfas: Dict[bytes, LazyDFA] = {}
        for trig in triggers:
            tb = trig.encode("utf-8")
            alts = []
            for st in structures:
                begin, end = st["begin"], st["end"]
                if not begin.startswith(trig):
                    continue
                body = build_json_regex(json.dumps(st.get("schema") or {}))
                alts.append(
                    _escape(begin[len(trig):]) + body + _escape(end)
                )
            if not alts:
                raise ValueError(
                    f"trigger {trig!r} matches no structure begin"
                )
            self.trigger_bytes.append(tb)
            self.dfas[tb] = LazyDFA(
                "(?:" + "|".join(alts) + ")" if len(alts) > 1 else alts[0]
            )
        self._max_trig = max(len(t) for t in self.trigger_bytes)

        # mutable state
        self.mode = "free"  # "free" | "struct"
        self.dfa: Optional[LazyDFA] = None
        self.state = 0
        self.tail = b""  # rolling free-mode byte tail (trigger detector)
        self.finished = False
        self.error = False
        self._stack: List[tuple] = []
        self._mask_cache: Dict[Tuple[int, int], np.ndarray] = {}
        self._all_ones: Optional[np.ndarray] = None

    # ------------------------------------------------------------------
    def _snapshot(self):
        return (self.mode, self.dfa, self.state, self.tail, self.finished,
                self.error)

    def _feed_byte(self, b: int) -> bool:
        if self.mode == "struct":
            ns = self.dfa.step(self.state, b)
            if self.dfa.is_dead(ns):
                if self.dfa.is_accepting(self.state):
                    # structure complete; byte belongs to resumed free text
                    self.mode, self.dfa, self.tail = "free", None, b""
                    return self._feed_byte(b)
                self.error = True
                return False
            self.state = ns
            return True
        # free mode: anything goes; watch for triggers
        self.tail = (self.tail + bytes([b]))[-self._max_trig:]
        for tb in self.trigger_bytes:
            if self.tail.endswith(tb):
                self.mode = "struct"
                self.dfa = self.dfas[tb]
                self.state = self.dfa.start
                self.tail = b""
                break
        return True

    def accept_token(self, token_id: int) -> bool:
        self._stack.append(self._snapshot())
        if token_id == self.vocab.eos_token_id:
            if self.mode == "struct" and not self.dfa.is_accepting(self.state):
                self.error = True
                return False
            self.finished = True
            return True
        for b in self.vocab.token_bytes(token_id):
            if not self._feed_byte(b):
                return False
        return True

    def rollback(self, n: int = 1):
        for _ in range(n):
            if self._stack:
                (self.mode, self.dfa, self.state, self.tail, self.finished,
                 self.error) = self._stack.pop()

    def reset(self):
        self.mode, self.dfa, self.state, self.tail = "free", None, 0, b""
        self.finished = False
        self.error = False
        self._stack.clear()

    # ------------------------------------------------------------------
    def vocab_mask(self) -> np.ndarray:
        if self.mode == "struct" and self.dfa.is_accepting(self.state):
            # structure complete -> free text resumes
            self.mode, self.dfa, self.tail = "free", None, b""
        if self.mode == "free":
            if self._all_ones is None:
                nwords = (self.vocab.vocab_size + 31) // 32
                self._all_ones = np.full(nwords, 0xFFFFFFFF, dtype=np.uint32)
            return self._all_ones
        key = (id(self.dfa), self.state)
        if key not in self._mask_cache:
            self._mask_cache[key] = self.vocab.compute_mask(
                self.dfa, self.state
            )
        mask = self._mask_cache[key]
        if not mask.any():
            self.error = True
            mask = mask.copy()
            tid = self.vocab.eos_token_id or 0
            mask[tid >> 5] |= np.uint32(1 << (tid & 31))
        return mask

    def is_accepting(self) -> bool:
        return self.mode == "free" or self.dfa.is_accepting(self.state)

    def forced_continuation(self, max_len: int = 512) -> bytes:
        """Jump-forward text: only meaningful inside a structure."""
        if self.mode != "struct":
            return b""
        return self.dfa.forced_path(self.state, max_len)
