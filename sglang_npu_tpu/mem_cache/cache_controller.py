"""Async transfer engine for the hierarchical KV cache.

Behavioral counterpart of the reference's `srt/managers/cache_controller.py`
(`HiCacheController:215`, write/load threads `:318-342`, storage
prefetch/backup threads) re-designed for the TPU execution model:

* All DEVICE interactions stay on the scheduler thread.  JAX arrays are
  functional, so a device->host backup is split into a cheap on-device
  gather *dispatch* (scheduler thread — after which the source pages may be
  freed immediately: the gather output was computed at dispatch order) and
  the slow host fetch (`jax.device_get`, background thread).  Restores are
  the mirror image: background `device_put` upload, then a cheap pool
  commit on the scheduler thread.  This replaces the reference's CUDA
  stream + LayerDoneCounter machinery.
* A second daemon serves the storage tier (file/external), strictly FIFO so
  a fetch enqueued after a store of the same key observes the written value.

Jobs are plain objects polled by the owner (`HiRadixCache.poll`) — no
callbacks touch the tree off-thread.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

PENDING, DONE, FAILED = 0, 1, 2


class BackupJob:
    """Device->host KV backup (gather already dispatched; fetch pending).

    ``tag`` is an owner-opaque snapshot — (epoch, namespace, path tokens,
    start offset) — so completion can be attached by token path even if the
    tree mutated (splits/evictions) while the job was in flight."""

    __slots__ = ("tag", "handle", "state", "result")

    def __init__(self, tag, handle):
        self.tag = tag
        self.handle = handle
        self.state = PENDING
        self.result: Optional[np.ndarray] = None


class LoadJob:
    """Host->device restore: background upload, commit on poll."""

    __slots__ = ("tag", "slots", "host_kv", "state", "handle")

    def __init__(self, tag, slots: np.ndarray, host_kv: np.ndarray):
        self.tag = tag
        self.slots = slots
        self.host_kv = host_kv
        self.state = PENDING
        self.handle = None


class StoreJob:
    """Host->storage spill of per-page arrays."""

    __slots__ = ("keys", "pages", "state")

    def __init__(self, keys: List[str], pages: List[np.ndarray]):
        self.keys = keys
        self.pages = pages
        self.state = PENDING


class FetchJob:
    """Storage->host fetch of a run of page keys (stops at first hole)."""

    __slots__ = ("tag", "keys", "state", "result")

    def __init__(self, tag, keys: List[str]):
        self.tag = tag
        self.keys = keys
        self.state = PENDING
        self.result: Optional[np.ndarray] = None  # concatenated rows


class ProbeJob:
    """Storage existence probe + fetch for pages beyond the radix tree
    (restart-survivable prefix reuse)."""

    __slots__ = ("tag", "keys", "state", "result")

    def __init__(self, tag, keys: List[str]):
        self.tag = tag
        self.keys = keys
        self.state = PENDING
        self.result: Optional[List[np.ndarray]] = None  # per-page rows


class CacheController:
    def __init__(self, kv_io, storage=None):
        self.kv_io = kv_io
        self.storage = storage
        self._transfer_q: "queue.Queue" = queue.Queue()
        self._storage_q: "queue.Queue" = queue.Queue()
        self._done_q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(
                target=self._transfer_loop, daemon=True, name="hicache-io"
            )
        ]
        if storage is not None:
            self._threads.append(
                threading.Thread(
                    target=self._storage_loop, daemon=True, name="hicache-store"
                )
            )
        for t in self._threads:
            t.start()

    # ------------------------------------------------------------------
    # Submission (scheduler thread)
    # ------------------------------------------------------------------
    def submit_backup(self, tag, slots: np.ndarray) -> BackupJob:
        handle = self.kv_io.gather_kv_dispatch(slots)
        job = BackupJob(tag, handle)
        self._transfer_q.put(job)
        return job

    def submit_load(self, tag, slots: np.ndarray, host_kv: np.ndarray) -> LoadJob:
        job = LoadJob(tag, slots, host_kv)
        self._transfer_q.put(job)
        return job

    def submit_store(self, keys: List[str], pages: List[np.ndarray]) -> StoreJob:
        job = StoreJob(keys, pages)
        self._storage_q.put(job)
        return job

    def submit_fetch(self, tag, keys: List[str]) -> FetchJob:
        job = FetchJob(tag, keys)
        self._storage_q.put(job)
        return job

    def submit_probe(self, tag, keys: List[str]) -> ProbeJob:
        job = ProbeJob(tag, keys)
        self._storage_q.put(job)
        return job

    # ------------------------------------------------------------------
    def drain_done(self) -> List[object]:
        """Completed jobs since the last call (scheduler thread)."""
        out = []
        while True:
            try:
                out.append(self._done_q.get_nowait())
            except queue.Empty:
                return out

    def idle(self) -> bool:
        return self._transfer_q.empty() and self._storage_q.empty()

    def shutdown(self):
        self._stop.set()
        for _ in self._threads:
            self._transfer_q.put(None)
            self._storage_q.put(None)
        for t in self._threads:
            t.join(timeout=5)

    # ------------------------------------------------------------------
    # Worker loops
    # ------------------------------------------------------------------
    def _transfer_loop(self):
        while not self._stop.is_set():
            job = self._transfer_q.get()
            if job is None:
                return
            try:
                if isinstance(job, BackupJob):
                    job.result = self.kv_io.gather_kv_fetch(job.handle)
                    job.handle = None
                    job.state = DONE
                elif isinstance(job, LoadJob):
                    job.handle = self.kv_io.scatter_kv_upload(
                        job.host_kv, len(job.slots)
                    )
                    job.state = DONE  # commit happens on poll
                else:  # pragma: no cover - defensive
                    raise TypeError(type(job))
            except Exception:
                logger.exception("hicache transfer failed")
                job.state = FAILED
            self._done_q.put(job)

    def _storage_loop(self):
        while not self._stop.is_set():
            job = self._storage_q.get()
            if job is None:
                return
            try:
                if isinstance(job, StoreJob):
                    self.storage.batch_set(job.keys, job.pages)
                    job.state = DONE
                elif isinstance(job, FetchJob):
                    pages = []
                    for k in job.keys:
                        v = self.storage.get(k)
                        if v is None:
                            raise KeyError(k)
                        pages.append(v)
                    job.result = np.concatenate(pages, axis=3)
                    job.state = DONE
                elif isinstance(job, ProbeJob):
                    n = self.storage.batch_exists(job.keys)
                    pages = []
                    for k in job.keys[:n]:
                        v = self.storage.get(k)
                        if v is None:
                            break
                        pages.append(v)
                    job.result = pages
                    job.state = DONE
                else:  # pragma: no cover - defensive
                    raise TypeError(type(job))
            except Exception:
                if isinstance(job, FetchJob) or isinstance(job, ProbeJob):
                    logger.debug("hicache storage miss/failure", exc_info=True)
                else:
                    logger.exception("hicache storage op failed")
                job.state = FAILED
            self._done_q.put(job)
