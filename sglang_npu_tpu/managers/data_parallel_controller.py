"""Data-parallel controller: request dispatch over engine replicas.

Counterpart of the reference's
`srt/managers/data_parallel_controller.py:65` (`LoadBalanceMethod:49` —
round_robin / shortest_queue / minimum_tokens dispatch `:272-331`):
``dp_size`` replicas each own a tensor-parallel submesh, a ModelRunner,
and a Scheduler; this controller thread sits between the
TokenizerManager and the replica input queues.

TPU process model: the reference spawns dp_size x (tp x pp) scheduler
subprocesses; here each replica is a scheduler thread driving an SPMD
program over its own ``tp_size``-device submesh of one host process —
cross-host DP uses the same controller over the ZMQ transport
(`managers/zmq_transport.py`).
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Dict, List

from sglang_npu_tpu.managers.io_struct import (
    AbortReq,
    TokenizedGenerateReqInput,
)

logger = logging.getLogger(__name__)

LOAD_BALANCE_METHODS = ("round_robin", "shortest_queue", "minimum_tokens")


class DataParallelController:
    def __init__(
        self,
        input_queue: "queue.Queue",
        replica_queues: List["queue.Queue"],
        schedulers: List,  # in-process Scheduler objects (load inspection)
        method: str = "round_robin",
    ):
        if method not in LOAD_BALANCE_METHODS:
            raise ValueError(f"unknown load balance method {method}")
        if schedulers is None and method != "round_robin":
            logger.warning(
                "remote replicas cannot be introspected; falling back to "
                "round_robin dispatch"
            )
            method = "round_robin"
        self.input_queue = input_queue
        self.replica_queues = replica_queues
        self.schedulers = schedulers
        self.method = method
        self._rr = 0
        self._rid_to_replica: Dict[str, int] = {}
        self._running = True

    # ------------------------------------------------------------------
    def _pick(self, item: TokenizedGenerateReqInput) -> int:
        n = len(self.replica_queues)
        if self.method == "round_robin":
            r = self._rr % n
            self._rr += 1
            return r
        if self.method == "shortest_queue":
            loads = [
                len(s.waiting_queue) + len(s.running_batch.reqs)
                for s in self.schedulers
            ]
            return int(min(range(n), key=loads.__getitem__))
        # minimum_tokens: fewest in-flight tokens (waiting prompt tokens +
        # running kv tokens), reference `data_parallel_controller.py:331`
        loads = [
            sum(len(r.origin_input_ids) for r in s.waiting_queue)
            + sum(r.seq_len for r in s.running_batch.reqs)
            for s in self.schedulers
        ]
        return int(min(range(n), key=loads.__getitem__))

    # ------------------------------------------------------------------
    def event_loop(self):
        while self._running:
            try:
                item = self.input_queue.get(timeout=1.0)
            except queue.Empty:
                continue
            if item is None:
                for q in self.replica_queues:
                    q.put(None)
                self._running = False
                return
            if isinstance(item, TokenizedGenerateReqInput):
                r = self._pick(item)
                self._rid_to_replica[item.rid] = r
                self.replica_queues[r].put(item)
            elif isinstance(item, AbortReq) and not item.abort_all:
                r = self._rid_to_replica.pop(item.rid, None)
                if r is not None:
                    self.replica_queues[r].put(item)
            else:
                # control RPCs (flush/abort-all/update-weights/session...)
                # broadcast to every replica
                for q in self.replica_queues:
                    q.put(item)

    def shutdown(self):
        self._running = False
        self.input_queue.put(None)


def run_controller_thread(controller: DataParallelController):
    t = threading.Thread(
        target=controller.event_loop, daemon=True, name="dp-controller"
    )
    t.start()
    return t
