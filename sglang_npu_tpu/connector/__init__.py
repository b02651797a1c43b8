"""Remote storage connectors.

Counterpart of the reference's `srt/connector/` stack
(`base_connector.py BaseConnector`, `redis.py`, `s3.py`,
`serde/safe_serde.py`): URL-addressed backends for pulling model weights
(and, via HiCache's storage ABC, KV pages) from remote stores.

Supported URL schemes:
  * ``file://``  — local directory (also the test backend)
  * ``redis://`` — key/value (requires the optional `redis` package)
  * ``s3://``    — object store (requires the optional `boto3` package)

`pull_model(url, cache_dir)` materializes a model directory into a local
cache keyed by the URL, so `--model-path redis://host/model` just works:
the loader sees a normal local safetensors directory.
"""

from __future__ import annotations

import hashlib
import logging
import os
import shutil
from abc import ABC, abstractmethod
from typing import List, Optional
from urllib.parse import urlparse

logger = logging.getLogger(__name__)

SCHEMES = ("file://", "redis://", "s3://")


def is_remote_url(path: str) -> bool:
    return isinstance(path, str) and path.startswith(SCHEMES)


class BaseConnector(ABC):
    """Key/blob interface (reference `BaseConnector:16`)."""

    def __init__(self, url: str):
        self.url = url

    @abstractmethod
    def list(self, prefix: str = "") -> List[str]:
        ...

    @abstractmethod
    def get(self, key: str) -> bytes:
        ...

    @abstractmethod
    def set(self, key: str, data: bytes) -> None:
        ...

    def close(self) -> None:
        pass


class FileConnector(BaseConnector):
    """file://<abs-dir> — blobs are files under the directory."""

    def __init__(self, url: str):
        super().__init__(url)
        p = urlparse(url)
        self.root = (p.netloc + p.path) if p.netloc else p.path
        os.makedirs(self.root, exist_ok=True)

    def list(self, prefix: str = "") -> List[str]:
        out = []
        for dirpath, _, files in os.walk(self.root):
            for f in files:
                rel = os.path.relpath(os.path.join(dirpath, f), self.root)
                if rel.startswith(prefix):
                    out.append(rel)
        return sorted(out)

    def get(self, key: str) -> bytes:
        with open(os.path.join(self.root, key), "rb") as f:
            return f.read()

    def set(self, key: str, data: bytes) -> None:
        path = os.path.join(self.root, key)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)


class RedisConnector(BaseConnector):
    """redis://host[:port]/<prefix> (requires the redis package)."""

    def __init__(self, url: str):
        super().__init__(url)
        import redis  # optional dependency

        p = urlparse(url)
        self.prefix = p.path.lstrip("/")
        self.client = redis.Redis(
            host=p.hostname or "localhost", port=p.port or 6379
        )

    def _k(self, key: str) -> str:
        return f"{self.prefix}/{key}" if self.prefix else key

    def list(self, prefix: str = "") -> List[str]:
        pat = self._k(prefix) + "*"
        keys = [k.decode() for k in self.client.keys(pat)]
        strip = len(self.prefix) + 1 if self.prefix else 0
        return sorted(k[strip:] for k in keys)

    def get(self, key: str) -> bytes:
        data = self.client.get(self._k(key))
        if data is None:
            raise KeyError(key)
        return data

    def set(self, key: str, data: bytes) -> None:
        self.client.set(self._k(key), data)

    def close(self) -> None:
        self.client.close()


class S3Connector(BaseConnector):
    """s3://bucket/<prefix> (requires boto3)."""

    def __init__(self, url: str):
        super().__init__(url)
        import boto3  # optional dependency

        p = urlparse(url)
        self.bucket = p.netloc
        self.prefix = p.path.lstrip("/")
        self.client = boto3.client("s3")

    def _k(self, key: str) -> str:
        return f"{self.prefix}/{key}" if self.prefix else key

    def list(self, prefix: str = "") -> List[str]:
        paginator = self.client.get_paginator("list_objects_v2")
        out = []
        strip = len(self.prefix) + 1 if self.prefix else 0
        for page in paginator.paginate(
            Bucket=self.bucket, Prefix=self._k(prefix)
        ):
            for obj in page.get("Contents", []):
                out.append(obj["Key"][strip:])
        return sorted(out)

    def get(self, key: str) -> bytes:
        return self.client.get_object(
            Bucket=self.bucket, Key=self._k(key)
        )["Body"].read()

    def set(self, key: str, data: bytes) -> None:
        self.client.put_object(Bucket=self.bucket, Key=self._k(key), Body=data)


def create_connector(url: str) -> BaseConnector:
    if url.startswith("file://"):
        return FileConnector(url)
    if url.startswith("redis://"):
        return RedisConnector(url)
    if url.startswith("s3://"):
        return S3Connector(url)
    raise ValueError(f"unsupported connector url {url!r}")


def pull_model(url: str, cache_dir: Optional[str] = None) -> str:
    """Materialize a remote model directory locally (reference
    `connector` weight pulls); returns the local path.  Cached by URL
    hash; re-pull only if the cache is missing."""
    cache_dir = cache_dir or os.path.join(
        os.environ.get("SGLANG_TPU_CACHE", os.path.expanduser("~/.cache")),
        "sglang_npu_tpu", "models",
    )
    tag = hashlib.sha256(url.encode()).hexdigest()[:16]
    local = os.path.join(cache_dir, tag)
    done = os.path.join(local, ".complete")
    if os.path.exists(done):
        return local
    conn = create_connector(url)
    try:
        keys = conn.list()
        if not keys:
            raise FileNotFoundError(f"no blobs at {url}")
        tmp = local + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        for k in keys:
            path = os.path.join(tmp, k)
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "wb") as f:
                f.write(conn.get(k))
        shutil.rmtree(local, ignore_errors=True)
        os.replace(tmp, local)
        with open(done, "w") as f:
            f.write(url)
        logger.info("pulled %d blobs from %s -> %s", len(keys), url, local)
        return local
    finally:
        conn.close()
