"""Grammar objects and backend with async compile cache.

Behavioral counterpart of the reference's
`constrained/base_grammar_backend.py` (`BaseGrammarObject:29` accept/mask
API, `BaseGrammarBackend:111` with cache + json/regex/ebnf dispatch) built
on the in-repo byte-level FSM (`regex_engine.py`).

Masks are packed uint32 bitmaps `[ceil(V/32)]` (same wire shape as
xgrammar's `apply_token_bitmask`, reference `common_extension.cc:394`);
the sampler unpacks them on device.
"""

from __future__ import annotations

import concurrent.futures
import logging
import threading
from typing import Dict, Optional, Tuple

import numpy as np

from sglang_npu_tpu.constrained.json_schema import build_json_regex
from sglang_npu_tpu.constrained.regex_engine import LazyDFA
from sglang_npu_tpu.constrained.token_vocab import TokenVocab

logger = logging.getLogger(__name__)


class FsmGrammar:
    """Per-request grammar state (reference `BaseGrammarObject`)."""

    def __init__(self, dfa: LazyDFA, vocab: TokenVocab, device=None):
        self.dfa = dfa
        self.vocab = vocab
        self.state = dfa.start
        self._state_stack = []  # for speculative rollback
        self._mask_cache: Dict[int, np.ndarray] = {}
        self.finished = False
        self.error = False
        # dense on-device DFA tables (constrained/device_fsm.py); None when
        # the DFA was too large — the scheduler then uses the host K=1 path
        self.device = device

    def device_state_id(self) -> int:
        """Current state as a dense device-table row (FIN when finished)."""
        if self.finished or self.device is None:
            return -1  # caller maps to the stacked FIN row
        if self.dfa.is_dead(self.state):
            return -2  # caller maps to the stacked DEAD row
        return self.device.state_index[self.state]

    def accept_token(self, token_id: int) -> bool:
        self._state_stack.append(self.state)
        if token_id == self.vocab.eos_token_id:
            self.finished = True
            return True
        try:
            bs = self.vocab.token_bytes(token_id)
        except Exception:
            bs = b""
        s = self.state
        for b in bs:
            s = self.dfa.step(s, b)
            if self.dfa.is_dead(s):
                self.error = True
                return False
        self.state = s
        return True

    def forced_continuation(self, max_len: int = 512) -> bytes:
        """The unique forced byte continuation from the current state —
        the jump-forward string (reference `outlines_jump_forward.py`)."""
        if self.finished or self.error:
            return b""
        return self.dfa.forced_path(self.state, max_len)

    def reset(self):
        """Back to the start state (request retraction replays the FSM)."""
        self.state = self.dfa.start
        self._state_stack.clear()
        self.finished = False
        self.error = False

    def rollback(self, n: int = 1):
        for _ in range(n):
            if self._state_stack:
                self.state = self._state_stack.pop()
        self.finished = False
        self.error = False

    def vocab_mask(self) -> np.ndarray:
        """Packed uint32 allowed-token bitmask for the current state."""
        if self.state not in self._mask_cache:
            self._mask_cache[self.state] = self.vocab.compute_mask(
                self.dfa, self.state
            )
        mask = self._mask_cache[self.state]
        if not mask.any():
            # dead-end grammar: allow EOS so the request can finish
            self.error = True
            mask = mask.copy()
            tid = self.vocab.eos_token_id or 0
            mask[tid >> 5] |= np.uint32(1 << (tid & 31))
        return mask

    def is_accepting(self) -> bool:
        return self.dfa.is_accepting(self.state)


class GrammarBackend:
    """Compile cache + thread pool (reference async grammar queue,
    `scheduler.py:2017 move_ready_grammar_requests`)."""

    def __init__(self, tokenizer, vocab_size: int, num_threads: int = 2):
        self.tokenizer = tokenizer
        self.vocab_size = vocab_size
        self._dfa_cache: Dict[Tuple[str, str], tuple] = {}  # (dfa, device)
        self._lock = threading.Lock()
        self._pool = concurrent.futures.ThreadPoolExecutor(num_threads)
        self._vocab: Optional[TokenVocab] = None

    def _get_vocab(self) -> TokenVocab:
        if self._vocab is None:
            self._vocab = TokenVocab.get(self.tokenizer, self.vocab_size)
        return self._vocab

    def _compile(self, kind: str, spec: str):
        if kind == "structural_tag":
            # composite grammar: free text until a trigger, then a
            # per-trigger DFA (constrained/structural_tag.py); the inner
            # DFAs cache inside the object via the (kind, spec) cache below
            from sglang_npu_tpu.constrained.structural_tag import (
                StructuralTagGrammar,
            )

            key = (kind, spec)
            with self._lock:
                cached = self._dfa_cache.get(key)
            if cached is None:
                cached = (StructuralTagGrammar(spec, self._get_vocab()), None)
                with self._lock:
                    self._dfa_cache[key] = cached
            import copy

            g = copy.copy(cached[0])  # fresh per-request mutable state
            g.reset()
            g._stack = []
            return g
        key = (kind, spec)
        with self._lock:
            cached = self._dfa_cache.get(key)
        if cached is None:
            if kind == "json":
                from sglang_npu_tpu.constrained.pushdown import (
                    build_json_pushdown,
                    schema_needs_pushdown,
                )

                if schema_needs_pushdown(spec):
                    # recursive ($ref) or over-deep schema: context-free
                    # pushdown machine (reference xgrammar semantics);
                    # LazyDFA-compatible surface, host per-token masking
                    # (no dense device tables -> scheduler K=1 path)
                    machine = build_json_pushdown(spec)
                    with self._lock:
                        self._dfa_cache[key] = (machine, None)
                    return FsmGrammar(machine, self._get_vocab(), device=None)
                pattern = build_json_regex(spec)
            elif kind == "regex":
                pattern = spec
            elif kind == "ebnf":
                from sglang_npu_tpu.constrained.ebnf import ebnf_to_regex

                pattern = ebnf_to_regex(spec)
            else:
                raise ValueError(f"unsupported grammar kind {kind}")
            dfa = LazyDFA(pattern)
            # Materialize dense device tables on this compile thread so the
            # fused K-step decode window can mask+transition without host
            # round-trips (falls back to None for huge DFAs).
            from sglang_npu_tpu.constrained.device_fsm import (
                build_device_grammar,
            )

            try:
                device = build_device_grammar(dfa, self._get_vocab())
            except Exception:
                logger.exception("device grammar build failed; host fallback")
                device = None
            cached = (dfa, device)
            with self._lock:
                self._dfa_cache[key] = cached
        dfa, device = cached
        return FsmGrammar(dfa, self._get_vocab(), device=device)

    def submit(self, kind: str, spec: str) -> "concurrent.futures.Future[FsmGrammar]":
        return self._pool.submit(self._compile, kind, spec)

    def compile_sync(self, kind: str, spec: str) -> FsmGrammar:
        return self._compile(kind, spec)
