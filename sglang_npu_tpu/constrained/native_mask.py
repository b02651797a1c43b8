"""ctypes binding for the native token-mask projection.

Builds `csrc/token_mask.cpp` on demand with g++ (source-hash-keyed cache,
same scheme as the router's radix tree); returns None when no toolchain
is available and grammar compilation falls back to the pure-Python
per-state trie walk (`TokenVocab.compute_mask`).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "csrc" / "token_mask.cpp"
_lock = threading.Lock()
_lib = None
_failed = False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is None and not _failed:
            try:
                src = _SRC.read_bytes()
                tag = hashlib.sha256(src).hexdigest()[:16]
                cache = Path(
                    os.environ.get(
                        "SGLANG_TPU_CACHE", os.path.expanduser("~/.cache")
                    )
                ) / "sglang_npu_tpu"
                cache.mkdir(parents=True, exist_ok=True)
                so = cache / f"token_mask_{tag}.so"
                if not so.exists():
                    tmp = so.with_suffix(".so.tmp")
                    subprocess.run(
                        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                         str(_SRC), "-o", str(tmp)],
                        check=True, capture_output=True,
                    )
                    os.replace(tmp, so)
                lib = ctypes.CDLL(str(so))
                lib.compute_state_masks.argtypes = [
                    ctypes.c_void_p, ctypes.c_int32,  # byte_table, S
                    ctypes.c_void_p,  # accepting
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_int32,  # edges..., n_nodes
                    ctypes.c_void_p, ctypes.c_void_p,  # tok_start, tok_ids
                    ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
                ]
                _lib = lib
            except Exception as e:
                logger.warning("native token mask unavailable: %s", e)
                _failed = True
    return _lib


def flatten_trie(vocab) -> Tuple[np.ndarray, ...]:
    """Flatten the vocab byte trie into edge/token arrays (cached)."""
    cached = getattr(vocab, "_flat_trie", None)
    if cached is not None:
        return cached
    nodes = [vocab.root]
    index = {id(vocab.root): 0}
    i = 0
    while i < len(nodes):
        for ch in nodes[i].children.values():
            index[id(ch)] = len(nodes)
            nodes.append(ch)
        i += 1
    N = len(nodes)
    edge_start = np.zeros(N + 1, np.int32)
    tok_start = np.zeros(N + 1, np.int32)
    edge_byte, edge_target, tok_ids = [], [], []
    for ni, node in enumerate(nodes):
        edge_start[ni] = len(edge_byte)
        tok_start[ni] = len(tok_ids)
        for b, ch in node.children.items():
            edge_byte.append(b)
            edge_target.append(index[id(ch)])
        tok_ids.extend(node.token_ids)
    edge_start[N] = len(edge_byte)
    tok_start[N] = len(tok_ids)
    flat = (
        edge_start,
        np.asarray(edge_byte, np.int32),
        np.asarray(edge_target, np.int32),
        tok_start,
        np.asarray(tok_ids, np.int32),
    )
    vocab._flat_trie = flat
    return flat


def compute_masks_native(
    byte_table: np.ndarray,  # [S, 256] int32, dead = -1
    accepting: np.ndarray,  # [S] uint8
    vocab,
) -> Optional[np.ndarray]:
    """All-states mask table [S, ceil(V/32)] uint32, or None (no g++)."""
    lib = load()
    if lib is None:
        return None
    S = byte_table.shape[0]
    if S >= (1 << 20):  # DFS packing limit (never hit: device cap is 1k)
        return None
    edge_start, edge_byte, edge_target, tok_start, tok_ids = flatten_trie(
        vocab
    )
    nwords = (vocab.vocab_size + 31) // 32
    out = np.zeros((S, nwords), np.uint32)
    bt = np.ascontiguousarray(byte_table, np.int32)
    acc = np.ascontiguousarray(accepting, np.uint8)
    eos = vocab.eos_token_id if vocab.eos_token_id is not None else -1
    lib.compute_state_masks(
        bt.ctypes.data, S, acc.ctypes.data,
        edge_start.ctypes.data, edge_byte.ctypes.data,
        edge_target.ctypes.data, len(edge_start) - 1,
        tok_start.ctypes.data, tok_ids.ctypes.data,
        out.ctypes.data, nwords, int(eos),
    )
    return out
