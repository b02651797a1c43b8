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
            text = None
            # re-derive bytes from the trie would be costly; decode lazily
            bs = self._token_bytes(token_id)
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

    _token_bytes_cache: Dict[Tuple[int, int], bytes] = {}

    def _token_bytes(self, token_id: int) -> bytes:
        key = (id(self.vocab), token_id)
        cache = FsmGrammar._token_bytes_cache
        if key not in cache:
            # walk trie to find the token's byte path (built once per vocab)
            if not hasattr(self.vocab, "_id_to_bytes"):
                m = {}

                def rec(node, path):
                    for tid in node.token_ids:
                        m[tid] = bytes(path)
                    for b, ch in node.children.items():
                        rec(ch, path + [b])

                rec(self.vocab.root, [])
                self.vocab._id_to_bytes = m
            cache[key] = self.vocab._id_to_bytes.get(token_id, b"")
        return cache[key]

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

    def _compile(self, kind: str, spec: str) -> FsmGrammar:
        key = (kind, spec)
        with self._lock:
            cached = self._dfa_cache.get(key)
        if cached is None:
            if kind == "json":
                pattern = build_json_regex(spec)
            elif kind == "regex":
                pattern = spec
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
