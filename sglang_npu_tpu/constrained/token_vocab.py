"""Token-id -> byte-sequence mapping and a shared byte trie.

Used to project a byte-level DFA onto the tokenizer vocabulary: for a DFA
state, the allowed-token bitmask is computed by walking the token trie and
pruning dead branches (shared prefixes make this far cheaper than testing
each token separately) — the role of xgrammar's token mask computation in
the reference (`constrained/xgrammar_backend.py`).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_VOCAB_CACHE: Dict[int, "TokenVocab"] = {}


class TrieNode:
    __slots__ = ("children", "token_ids")

    def __init__(self):
        self.children: Dict[int, "TrieNode"] = {}
        self.token_ids: List[int] = []


class TokenVocab:
    def __init__(self, tokenizer, vocab_size: int):
        self.vocab_size = vocab_size
        self.eos_token_id = getattr(tokenizer, "eos_token_id", None)
        self.special_ids = set(getattr(tokenizer, "all_special_ids", []) or [])
        self.root = TrieNode()
        n_mapped = 0
        for tid in range(vocab_size):
            if tid in self.special_ids:
                continue
            try:
                text = tokenizer.decode([tid])
            except Exception:
                continue
            if not text:
                continue
            bs = text.encode("utf-8")
            node = self.root
            for b in bs:
                node = node.children.setdefault(b, TrieNode())
            node.token_ids.append(tid)
            n_mapped += 1
        logger.info("token vocab trie built: %d/%d tokens", n_mapped, vocab_size)

    @classmethod
    def get(cls, tokenizer, vocab_size: int) -> "TokenVocab":
        key = id(tokenizer)
        if key not in _VOCAB_CACHE:
            _VOCAB_CACHE[key] = cls(tokenizer, vocab_size)
        return _VOCAB_CACHE[key]

    # ------------------------------------------------------------------
    def token_bytes(self, token_id: int) -> bytes:
        """UTF-8 bytes of one token (trie walk inverted lazily, once)."""
        if not hasattr(self, "_id_to_bytes"):
            m: Dict[int, bytes] = {}

            def rec(node: TrieNode, path: list):
                for tid in node.token_ids:
                    m[tid] = bytes(path)
                for b, ch in node.children.items():
                    rec(ch, path + [b])

            rec(self.root, [])
            self._id_to_bytes = m
        return self._id_to_bytes.get(token_id, b"")

    # ------------------------------------------------------------------
    def compute_mask(self, dfa, state: int) -> np.ndarray:
        """Allowed-token bitmask (packed uint32 [ceil(V/32)]) for a DFA
        state: a token is allowed iff all its bytes keep the DFA alive.
        EOS is allowed iff the state is accepting."""
        nwords = (self.vocab_size + 31) // 32
        mask = np.zeros(nwords, dtype=np.uint32)

        def visit(node: TrieNode, s: int):
            for tid in node.token_ids:
                mask[tid >> 5] |= np.uint32(1 << (tid & 31))
            for b, child in node.children.items():
                ns = dfa.step(s, b)
                if not dfa.is_dead(ns):
                    visit(child, ns)

        visit(self.root, state)
        if dfa.is_accepting(state) and self.eos_token_id is not None:
            tid = self.eos_token_id
            mask[tid >> 5] |= np.uint32(1 << (tid & 31))
        return mask
