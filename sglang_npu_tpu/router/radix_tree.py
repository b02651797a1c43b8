"""ctypes binding for the C++ cache-aware routing tree.

The reference ships this as Rust (`sgl-router/src/tree.rs`); here it is
C++ (`csrc/radix_tree.cpp`) compiled on demand with g++ into a
source-hash-keyed shared object under ``~/.cache/sglang_npu_tpu`` (no
pybind11 in the image — plain C ABI + ctypes).  ``load()`` returns None
when no toolchain is available; the router then falls back to the pure
Python PrefixMap.
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

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "csrc" / "radix_tree.cpp"
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build_lib() -> Optional[ctypes.CDLL]:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache = Path(
        os.environ.get("SGLANG_TPU_CACHE", os.path.expanduser("~/.cache"))
    ) / "sglang_npu_tpu"
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"radix_tree_{tag}.so"
    if not so.exists():
        tmp = so.with_suffix(".so.tmp")
        cmd = [
            "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
            str(_SRC), "-o", str(tmp),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so)
        logger.info("built %s", so)
    lib = ctypes.CDLL(str(so))
    lib.rtree_new.restype = ctypes.c_void_p
    lib.rtree_free.argtypes = [ctypes.c_void_p]
    lib.rtree_insert.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
    ]
    lib.rtree_prefix_match.restype = ctypes.c_size_t
    lib.rtree_prefix_match.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.rtree_tenant_size.restype = ctypes.c_long
    lib.rtree_tenant_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rtree_smallest_tenant.restype = ctypes.c_int
    lib.rtree_smallest_tenant.argtypes = [ctypes.c_void_p]
    lib.rtree_evict_tenant.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_long,
    ]
    lib.rtree_remove_tenant.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rtree_node_count.restype = ctypes.c_long
    lib.rtree_node_count.argtypes = [ctypes.c_void_p]
    return lib


def load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is None and not _lib_failed:
            try:
                _lib = _build_lib()
            except Exception as e:  # no g++ / build error -> python fallback
                logger.warning("C++ radix tree unavailable: %s", e)
                _lib_failed = True
    return _lib


class RadixTree:
    """Multi-tenant prefix->worker affinity tree (C++ backed).

    Tenants are worker URLs; ids are interned internally.
    """

    def __init__(self):
        lib = load()
        if lib is None:
            raise RuntimeError("C++ radix tree unavailable")
        self._lib = lib
        self._h = lib.rtree_new()
        self._tenant_of: dict[str, int] = {}
        self._url_of: dict[int, str] = {}
        self._next = 0

    def __del__(self):
        try:
            self._lib.rtree_free(self._h)
        except Exception:
            pass

    def _tid(self, url: str) -> int:
        t = self._tenant_of.get(url)
        if t is None:
            t = self._next
            self._next += 1
            self._tenant_of[url] = t
            self._url_of[t] = url
        return t

    def insert(self, text: str, url: str) -> None:
        b = text.encode("utf-8", "ignore")
        self._lib.rtree_insert(self._h, b, len(b), self._tid(url))

    def prefix_match(self, text: str) -> Tuple[int, Optional[str]]:
        b = text.encode("utf-8", "ignore")
        out = ctypes.c_int(-1)
        n = self._lib.rtree_prefix_match(
            self._h, b, len(b), ctypes.byref(out)
        )
        url = self._url_of.get(out.value) if out.value >= 0 else None
        return int(n), url

    def tenant_size(self, url: str) -> int:
        if url not in self._tenant_of:
            return 0
        return int(self._lib.rtree_tenant_size(self._h, self._tenant_of[url]))

    def evict(self, url: str, max_chars: int) -> None:
        if url in self._tenant_of:
            self._lib.rtree_evict_tenant(
                self._h, self._tenant_of[url], max_chars
            )

    def remove_worker(self, url: str) -> None:
        t = self._tenant_of.pop(url, None)
        if t is not None:
            self._url_of.pop(t, None)
            self._lib.rtree_remove_tenant(self._h, t)

    def smallest_tenant(self) -> Optional[str]:
        t = int(self._lib.rtree_smallest_tenant(self._h))
        return self._url_of.get(t) if t >= 0 else None

    def node_count(self) -> int:
        return int(self._lib.rtree_node_count(self._h))
