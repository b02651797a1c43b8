"""ZMQ control-plane transport for multi-host serving.

Counterpart of the reference's ZMQ process topology
(`srt/entrypoints/engine.py:674-821` `_launch_subprocesses`, PortArgs
`server_args.py:2112`): tokenizer -> scheduler and scheduler ->
detokenizer links become PUSH/PULL sockets carrying pickled `io_struct`
dataclasses.  The classes expose the `queue.Queue` get/put interface so
Scheduler, DetokenizerManager, and DataParallelController run unchanged
over threads (one host) or sockets (many hosts).

Port scheme rooted at --dist-init-addr HOST:PORT (all sockets bind on
the entry node; workers connect in, NAT-friendly):
    PORT + 1       workers PUSH results -> entry detokenizer PULL
    PORT + 10 + k  entry PUSH requests -> worker k PULL
"""

from __future__ import annotations

import logging
import pickle
import queue as _queue
import threading

logger = logging.getLogger(__name__)


def _ctx():
    import zmq

    if not hasattr(_ctx, "_instance"):
        _ctx._instance = zmq.Context.instance()
    return _ctx._instance


class ZmqPushQueue:
    """put()-side of a link. bind=True on the entry node."""

    def __init__(self, url: str, bind: bool = False):
        import zmq

        self.sock = _ctx().socket(zmq.PUSH)
        if bind:
            self.sock.bind(url)
        else:
            self.sock.connect(url)
        self._lock = threading.Lock()

    def put(self, item) -> None:
        payload = pickle.dumps(item, protocol=pickle.HIGHEST_PROTOCOL)
        with self._lock:
            self.sock.send(payload)

    def put_nowait(self, item) -> None:
        self.put(item)


class ZmqPullQueue:
    """get()-side of a link with queue.Queue timeout semantics."""

    def __init__(self, url: str, bind: bool = False):
        import zmq

        self._zmq = zmq
        self.sock = _ctx().socket(zmq.PULL)
        if bind:
            self.sock.bind(url)
        else:
            self.sock.connect(url)
        self._lock = threading.Lock()

    def get(self, block: bool = True, timeout=None):
        with self._lock:
            if not block:
                try:
                    return pickle.loads(
                        self.sock.recv(self._zmq.NOBLOCK)
                    )
                except self._zmq.Again:
                    raise _queue.Empty()
            if timeout is not None:
                if not self.sock.poll(int(timeout * 1000)):
                    raise _queue.Empty()
            return pickle.loads(self.sock.recv())

    def get_nowait(self):
        return self.get(block=False)


def entry_node_queues(dist_init_addr: str, num_workers: int):
    """Entry-node side: per-worker PUSH queues + the results PULL queue."""
    host, port = dist_init_addr.rsplit(":", 1)
    port = int(port)
    replica_queues = [
        ZmqPushQueue(f"tcp://*:{port + 10 + k}", bind=True)
        for k in range(num_workers)
    ]
    results = ZmqPullQueue(f"tcp://*:{port + 1}", bind=True)
    return replica_queues, results


def worker_node_queues(dist_init_addr: str, worker_index: int):
    """Worker side: input PULL + results PUSH, both connecting to entry."""
    host, port = dist_init_addr.rsplit(":", 1)
    port = int(port)
    inputs = ZmqPullQueue(f"tcp://{host}:{port + 10 + worker_index}")
    results = ZmqPushQueue(f"tcp://{host}:{port + 1}")
    return inputs, results


class NullQueue:
    """Output sink for SPMD worker schedulers: replies/streams are emitted
    by node 0 only (all replicas compute identical results)."""

    def put(self, item) -> None:
        pass

    def put_nowait(self, item) -> None:
        pass


class SpmdStepChannel:
    """Scheduler lockstep broadcast for cross-host SPMD (the surviving
    piece of the reference's `broadcast_pyobj`, `parallel_state.py:726`).

    Node 0 broadcasts the per-iteration input list; workers block on it.
    Every replica therefore sees the identical request stream at identical
    iteration boundaries, which (with deterministic scheduling policy)
    keeps all processes issuing the same SPMD programs in the same order.

    Ports (rooted at --dist-init-addr HOST:PORT):
        PORT + 5  entry PUB  -> workers SUB   (pickled (seq, items))
        PORT + 6  workers PUSH "ready" -> entry PULL  (slow-joiner sync)
    """

    def __init__(self, dist_init_addr: str, num_workers: int = 0,
                 is_entry: bool = True):
        import zmq

        self._zmq = zmq
        self.is_entry = is_entry
        self.seq = 0
        host, port = dist_init_addr.rsplit(":", 1)
        port = int(port)
        if is_entry:
            self.pub = _ctx().socket(zmq.PUB)
            self.pub.setsockopt(zmq.SNDHWM, 0)
            self.pub.bind(f"tcp://*:{port + 5}")
            ready = _ctx().socket(zmq.PULL)
            ready.bind(f"tcp://*:{port + 6}")
            for _ in range(num_workers):
                ready.recv()  # blocks until every worker has subscribed
            ready.close()
            self._lock = threading.Lock()
        else:
            self.sub = _ctx().socket(zmq.SUB)
            self.sub.setsockopt(zmq.RCVHWM, 0)
            self.sub.setsockopt_string(zmq.SUBSCRIBE, "")
            self.sub.connect(f"tcp://{host}:{port + 5}")
            import time as _time

            _time.sleep(0.2)  # let the SUB handshake settle before "ready"
            push = _ctx().socket(zmq.PUSH)
            push.connect(f"tcp://{host}:{port + 6}")
            push.send(b"ready")
            push.close()

    def broadcast(self, items: list) -> None:
        assert self.is_entry
        self.seq += 1
        with self._lock:
            self.pub.send(
                pickle.dumps((self.seq, items), protocol=pickle.HIGHEST_PROTOCOL)
            )

    def recv(self) -> list:
        assert not self.is_entry
        seq, items = pickle.loads(self.sub.recv())
        expected = self.seq + 1
        if seq != expected:
            raise RuntimeError(
                f"SPMD lockstep broke: got step {seq}, expected {expected}"
            )
        self.seq = seq
        return items
