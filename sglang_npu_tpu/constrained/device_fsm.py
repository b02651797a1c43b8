"""On-device grammar FSM tables for fused multi-step constrained decoding.

The reference overlaps host-side vocab-mask computation with the forward
pass (`model_runner.py:1703` `_preprocess_logits`) — one token per
dispatch.  On TPU the decode hot loop is a fused K-step `lax.scan`
(`model_runner._build_multi_step_fn`), so the grammar must advance *on
device* or the window collapses to K=1 (round-1 weakness).

This module materializes the lazy byte-DFA into three dense arrays that
live on the device and let the fused window mask + transition without any
host round-trip:

* ``byte_table  [S, 256] int32`` — DFA byte transitions (row-major states,
  dead = -1 before stacking).
* ``mask_table  [S, ceil(V/32)] uint32`` — packed allowed-token bitmask per
  state (exactly what `TokenVocab.compute_mask` produces for the host
  path, so device and host decisions are bit-identical).
* per-vocab ``token_bytes [V, Lmax] uint8`` / ``token_len [V] int32`` — a
  sampled token id is converted to its byte string on device and walked
  through ``byte_table``.

Stacked-batch layout (`stack_grammars`): every grammar in a batch is padded
to a shared ``S_pad`` with two distinguished rows so mixed batches need no
flags — ``FIN = S_pad-2`` (all-ones mask, self-loop: finished grammars and
non-grammar requests) and ``DEAD = S_pad-1`` (EOS-only mask, self-loop:
mirrors the host path's dead-end EOS escape).

Grammars whose DFA exceeds ``max_states`` fall back to the host K=1 path.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

MAX_DEVICE_STATES = 1024


class DeviceGrammar:
    """Dense DFA tables for one compiled grammar (shared across requests
    using the same spec; built once on the grammar compile thread)."""

    __slots__ = ("byte_table", "mask_table", "state_index", "num_states")

    def __init__(self, byte_table, mask_table, state_index):
        self.byte_table = byte_table  # [S, 256] int32, dead = -1
        self.mask_table = mask_table  # [S, W] uint32
        self.state_index = state_index  # dfa state id -> dense row
        self.num_states = byte_table.shape[0]


def build_device_grammar(
    dfa, vocab, max_states: int = MAX_DEVICE_STATES
) -> Optional[DeviceGrammar]:
    """Fully materialize ``dfa`` (bounded) and project per-state token
    masks.  Returns None when the DFA is too large for device tables."""
    order = [dfa.start]
    seen = {dfa.start}
    i = 0
    while i < len(order):
        s = order[i]
        i += 1
        for b in range(256):
            t = dfa.step(s, b)
            if t != dfa.DEAD and t not in seen:
                seen.add(t)
                order.append(t)
                if len(order) > max_states:
                    logger.info(
                        "grammar DFA exceeds %d states; host fallback",
                        max_states,
                    )
                    return None
    idx = {s: j for j, s in enumerate(order)}
    S = len(order)
    nwords = (vocab.vocab_size + 31) // 32
    byte_table = np.full((S, 256), -1, dtype=np.int32)
    accepting = np.zeros((S,), dtype=np.uint8)
    eos = vocab.eos_token_id
    for s in order:
        j = idx[s]
        accepting[j] = bool(dfa.is_accepting(s))
        for b in range(256):
            t = dfa.step(s, b)
            if t != dfa.DEAD:
                byte_table[j, b] = idx[t]

    # all-states mask projection: native C++ trie walk when a toolchain is
    # available (csrc/token_mask.cpp — the xgrammar-core analogue), else
    # the per-state Python walk
    from sglang_npu_tpu.constrained.native_mask import compute_masks_native

    mask_table = compute_masks_native(byte_table, accepting, vocab)
    if mask_table is None:
        mask_table = np.zeros((S, nwords), dtype=np.uint32)
        for s in order:
            mask_table[idx[s]] = vocab.compute_mask(dfa, s)
    if eos is not None:
        # dead-end escape: allow EOS (matches FsmGrammar.vocab_mask)
        dead_end = ~mask_table.any(axis=1)
        mask_table[dead_end, eos >> 5] |= np.uint32(1 << (eos & 31))
    return DeviceGrammar(byte_table, mask_table, idx)


def token_byte_arrays(vocab) -> Tuple[np.ndarray, np.ndarray]:
    """[V, Lmax] uint8 byte strings + [V] int32 lengths for the vocab
    (cached on the TokenVocab).  Tokens outside the trie get length 0 —
    they never appear under a grammar mask anyway."""
    cached = getattr(vocab, "_device_token_tables", None)
    if cached is not None:
        return cached
    id_to_bytes: Dict[int, bytes] = {}

    def rec(node, path):
        for tid in node.token_ids:
            id_to_bytes[tid] = bytes(path)
        for b, ch in node.children.items():
            path.append(b)
            rec(ch, path)
            path.pop()

    rec(vocab.root, [])
    V = vocab.vocab_size
    lmax = max((len(b) for b in id_to_bytes.values()), default=1)
    lmax = max(lmax, 1)
    token_bytes = np.zeros((V, lmax), dtype=np.uint8)
    token_len = np.zeros((V,), dtype=np.int32)
    for tid, bs in id_to_bytes.items():
        token_bytes[tid, : len(bs)] = np.frombuffer(bs, dtype=np.uint8)
        token_len[tid] = len(bs)
    vocab._device_token_tables = (token_bytes, token_len)
    return token_bytes, token_len


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def stack_grammars(
    grammars: List[DeviceGrammar], nwords: int, eos: Optional[int]
) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Pad + stack grammar tables to a shared bucketed S_pad with the FIN
    and DEAD rows appended.  Returns (byte [G, S_pad, 256] int32,
    mask [G, S_pad, W] uint32, FIN, DEAD)."""
    s_real = max(g.num_states for g in grammars)
    S_pad = max(_next_pow2(s_real + 2), 8)
    FIN, DEAD = S_pad - 2, S_pad - 1
    G = len(grammars)
    bt = np.full((G, S_pad, 256), DEAD, dtype=np.int32)
    eos_row = np.zeros((nwords,), dtype=np.uint32)
    if eos is not None:
        eos_row[eos >> 5] |= np.uint32(1 << (eos & 31))
    mt = np.broadcast_to(eos_row, (G, S_pad, nwords)).copy()
    for gi, g in enumerate(grammars):
        S = g.num_states
        b = g.byte_table.copy()
        b[b < 0] = DEAD
        bt[gi, :S] = b
        mt[gi, :S] = g.mask_table
    bt[:, FIN, :] = FIN
    mt[:, FIN, :] = np.uint32(0xFFFFFFFF)
    # DEAD rows already: self-loop (bt filled with DEAD) + EOS-only mask
    return bt, mt, FIN, DEAD
