"""Reasoner grammar wrapper: constraints apply only after ``</think>``.

Counterpart of the reference's `constrained/reasoner_grammar_backend.py`
(ReasonerGrammarObject): reasoning models (DeepSeek-R1, Qwen3) think in a
free-text `<think>...</think>` block before the final answer; structured
output must constrain the ANSWER, not the reasoning.  The wrapper passes
every token through unconstrained until the think-end token is sampled,
then activates the inner FSM.

Fused decode windows: while inactive, the request reports no device FSM
and an all-ones mask (and the scheduler's `_decode_window` treats it as
grammar-free, keeping K>1); the scheduler breaks the window at the
activation token (`just_activated`) so no unconstrained tokens leak past
``</think>`` — the discarded window tail's KV slots are reclaimed by the
normal `shrink_req` path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class ReasonerGrammar:
    def __init__(self, inner, think_end_id: int):
        self.inner = inner
        self.think_end_id = int(think_end_id)
        self.active = False
        self.just_activated = False
        self._ones: Optional[np.ndarray] = None
        # rollback bookkeeping: how many accepts happened inactive/active
        self._accept_log: list = []

    # -- state proxies -------------------------------------------------
    @property
    def is_inactive(self) -> bool:
        return not self.active

    @property
    def finished(self) -> bool:
        return self.active and self.inner.finished

    @finished.setter
    def finished(self, v) -> None:
        self.inner.finished = v

    @property
    def error(self) -> bool:
        return self.active and self.inner.error

    @property
    def device(self):
        return self.inner.device if self.active else None

    @property
    def vocab(self):
        return self.inner.vocab

    def device_state_id(self) -> int:
        return self.inner.device_state_id()

    # -- token flow ----------------------------------------------------
    def accept_token(self, token_id: int) -> bool:
        self.just_activated = False
        if not self.active:
            if token_id == self.think_end_id:
                self.active = True
                self.just_activated = True
            self._accept_log.append(False)
            return True
        self._accept_log.append(True)
        return self.inner.accept_token(token_id)

    def rollback(self, n: int = 1) -> None:
        for _ in range(n):
            if not self._accept_log:
                break
            was_inner = self._accept_log.pop()
            if was_inner:
                self.inner.rollback(1)
            else:
                # undoing the activation token re-enters the free region
                self.active = False
        self.just_activated = False

    def reset(self) -> None:
        self.inner.reset()
        self.active = False
        self.just_activated = False
        self._accept_log.clear()

    # -- masks / jump-forward -------------------------------------------
    def vocab_mask(self) -> np.ndarray:
        if self.active:
            return self.inner.vocab_mask()
        if self._ones is None:
            self._ones = np.full_like(self.inner.vocab_mask(), 0xFFFFFFFF)
        return self._ones

    def forced_continuation(self, max_len: int = 512) -> bytes:
        if not self.active:
            return b""
        return self.inner.forced_continuation(max_len)

    def is_accepting(self) -> bool:
        return self.active and self.inner.is_accepting()


def think_end_token_id(tokenizer) -> Optional[int]:
    """Resolve ``</think>`` to a single token id, or None when the
    tokenizer splits it (wrapping is then disabled, reference behavior)."""
    if tokenizer is None:
        return None
    try:
        ids = tokenizer.encode("</think>", add_special_tokens=False)
    except TypeError:
        ids = tokenizer.encode("</think>")
    if isinstance(ids, (list, tuple)) and len(ids) == 1:
        return int(ids[0])
    return None
