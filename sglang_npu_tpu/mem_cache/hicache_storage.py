"""External KV storage tier for the hierarchical cache.

Behavioral counterpart of the reference's `srt/mem_cache/hicache_storage.py`
(`HiCacheStorage:30` ABC, `HiCacheFile:102`, `get_hash_str:18`): a generic
content-addressed key/value store below host DRAM.  Keys are a rolling hash
chain over page-sized token runs, so KV pages survive server restarts and
can be shared across processes pointing at the same store.

Values are the host wire-format KV rows for one page:
``[L, 2, H, page_size, D]`` (true head_dim — lane padding is stripped by
`ModelRunner.gather_kv`), or the latent layout for MLA models.
"""

from __future__ import annotations

import hashlib
import logging
import os
from abc import ABC, abstractmethod
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def get_hash_str(token_ids: Sequence[int], prior_hash: Optional[str] = None) -> str:
    """Rolling page hash: H(prior || tokens) (reference
    `hicache_storage.py:18`)."""
    h = hashlib.sha256()
    if prior_hash:
        h.update(bytes.fromhex(prior_hash))
    for t in token_ids:
        h.update(int(t).to_bytes(4, "little", signed=False))
    return h.hexdigest()


def hash_chain(
    token_ids: Sequence[int], page_size: int, prior_hash: Optional[str] = None
) -> List[str]:
    """Hash for each full page of ``token_ids``, chained from
    ``prior_hash``."""
    out = []
    h = prior_hash
    for i in range(0, len(token_ids) // page_size * page_size, page_size):
        h = get_hash_str(token_ids[i : i + page_size], h)
        out.append(h)
    return out


class HiCacheStorage(ABC):
    """Key/value interface for a KV-cache storage tier (reference
    `hicache_storage.py:30`)."""

    @abstractmethod
    def get(self, key: str) -> Optional[np.ndarray]:
        ...

    @abstractmethod
    def set(self, key: str, value: np.ndarray) -> bool:
        ...

    @abstractmethod
    def exists(self, key: str) -> bool:
        ...

    def batch_get(self, keys: List[str]) -> List[Optional[np.ndarray]]:
        return [self.get(k) for k in keys]

    def batch_set(self, keys: List[str], values: List[np.ndarray]) -> bool:
        return all(self.set(k, v) for k, v in zip(keys, values))

    def batch_exists(self, keys: List[str]) -> int:
        """Number of LEADING keys present (prefix semantics — a hole ends
        the usable run)."""
        n = 0
        for k in keys:
            if not self.exists(k):
                break
            n += 1
        return n

    def delete(self, key: str) -> None:
        pass

    def clear(self) -> None:
        pass


class FileStorage(HiCacheStorage):
    """One ``.npy`` file per page under a directory (reference
    `HiCacheFile:102`).  Writes go through a temp file + rename so readers
    never observe partial pages."""

    def __init__(self, file_path: str = "/tmp/sglang_tpu_hicache"):
        self.file_path = file_path
        os.makedirs(file_path, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.file_path, f"{key}.npy")

    def get(self, key: str) -> Optional[np.ndarray]:
        try:
            with np.load(self._path(key)) as z:
                data, dtype = z["data"], str(z["dtype"])
            # KV rows are often ml_dtypes types (bfloat16) that a bare
            # np.save would round-trip as void; reconstruct from raw bytes
            return data.view(np.dtype(dtype))
        except (FileNotFoundError, ValueError, EOFError, KeyError, TypeError):
            return None

    def set(self, key: str, value: np.ndarray) -> bool:
        tmp = self._path(key) + f".tmp{os.getpid()}"
        try:
            raw = np.ascontiguousarray(value).view(np.uint8)
            # np.savez(path) would append its own suffix; write the handle
            with open(tmp, "wb") as f:
                np.savez(f, data=raw, dtype=np.str_(value.dtype.name))
            os.replace(tmp, self._path(key))
            return True
        except OSError:
            logger.exception("hicache file write failed")
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return False

    def exists(self, key: str) -> bool:
        return os.path.exists(self._path(key))

    def delete(self, key: str) -> None:
        try:
            os.unlink(self._path(key))
        except OSError:
            pass

    def clear(self) -> None:
        for f in os.listdir(self.file_path):
            if f.endswith(".npy"):
                try:
                    os.unlink(os.path.join(self.file_path, f))
                except OSError:
                    pass


class MemoryStorage(HiCacheStorage):
    """In-process dict store (tests / single-process second tier)."""

    def __init__(self):
        self.store: Dict[str, np.ndarray] = {}

    def get(self, key: str) -> Optional[np.ndarray]:
        return self.store.get(key)

    def set(self, key: str, value: np.ndarray) -> bool:
        self.store[key] = value
        return True

    def exists(self, key: str) -> bool:
        return key in self.store

    def delete(self, key: str) -> None:
        self.store.pop(key, None)

    def clear(self) -> None:
        self.store.clear()


class ConnectorStorage(HiCacheStorage):
    """KV pages in a remote blob store (reference `hicache_storage`'s
    mooncake/hf3fs-class external backends): any `connector/` URL —
    redis://, s3://, file:// — holds serialized pages keyed by content
    hash.  Survives restarts and is shareable across engines."""

    def __init__(self, url: str):
        from sglang_npu_tpu.connector import create_connector

        self.conn = create_connector(url)

    def get(self, key: str) -> Optional[np.ndarray]:
        import io

        try:
            raw = self.conn.get(key + ".npz")
        except Exception:
            return None
        try:
            with np.load(io.BytesIO(raw)) as z:
                data, dtype = z["data"], str(z["dtype"])
            # same raw-bytes+dtype scheme as FileStorage: KV rows are often
            # ml_dtypes types (bfloat16) a bare np.save would mangle
            return data.view(np.dtype(dtype))
        except Exception:
            return None

    def set(self, key: str, value: np.ndarray) -> bool:
        import io

        buf = io.BytesIO()
        raw = np.ascontiguousarray(value).view(np.uint8)
        np.savez(buf, data=raw, dtype=np.str_(value.dtype.name))
        try:
            self.conn.set(key + ".npz", buf.getvalue())
            return True
        except Exception:
            return False

    def exists(self, key: str) -> bool:
        try:
            return bool(self.conn.list(key + ".npz"))
        except Exception:
            return False


def make_storage(backend: Optional[str], path: str) -> Optional[HiCacheStorage]:
    if not backend:
        return None
    if backend == "file":
        return FileStorage(path)
    if backend == "memory":
        return MemoryStorage()
    if backend in ("redis", "s3", "connector"):
        # path carries the connector URL (e.g. redis://host/prefix); the
        # bare backend names accept a URL-less path for file:// parity
        url = path if "://" in path else f"{backend}://{path}"
        return ConnectorStorage(url)
    raise ValueError(f"unknown hicache storage backend: {backend!r}")
