"""Distributed weight sync for RL colocation (reference
`update_weights_from_distributed`, `model_runner.py:831-914` +
`weight_sync/utils.py`): a trainer process pushes named tensors to the
serving engine without touching disk.

The reference broadcasts over the trainer's NCCL group.  TPU-natively the
engine's weights are jax arrays fed by host `device_put`, so the sync
rides the host network instead: the trainer binds a ZMQ PUSH socket
(`WeightPublisher`), the engine connects a PULL socket
(`init_weights_update_group`) and `update_weights_from_distributed`
drains the expected tensors and applies them through the same in-place
update path as `update_weights_from_tensor`.

Wire format per tensor (multipart): [name, dtype, shape-json, raw bytes].
bfloat16 rides as ml_dtypes.bfloat16.
"""

from __future__ import annotations

import json
import logging
from typing import List, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _np_dtype(name: str):
    if name == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


class WeightPublisher:
    """Trainer-side publisher.  Bind, hand `.address` to the engine's
    init_weights_update_group, then `send_named` before each
    update_weights_from_distributed call."""

    def __init__(self, bind: str = "tcp://127.0.0.1:*"):
        import zmq

        self._ctx = zmq.Context.instance()
        self.sock = self._ctx.socket(zmq.PUSH)
        self.sock.bind(bind)
        self.address = self.sock.getsockopt_string(zmq.LAST_ENDPOINT)

    def send_named(self, named_tensors: Sequence[Tuple[str, np.ndarray]]):
        for name, arr in named_tensors:
            arr = np.ascontiguousarray(arr)
            self.sock.send_multipart(
                [
                    name.encode(),
                    str(arr.dtype).encode(),
                    json.dumps(list(arr.shape)).encode(),
                    arr.tobytes(),
                ]
            )

    def close(self):
        self.sock.close(0)


def recv_named(sock, names: List[str], timeout_ms: int = 600000):
    """Engine-side: drain len(names) tensors; order must match."""
    import zmq

    sock.setsockopt(zmq.RCVTIMEO, timeout_ms)
    out = []
    for expect in names:
        parts = sock.recv_multipart()
        name = parts[0].decode()
        if name != expect:
            raise ValueError(
                f"weight sync order mismatch: got {name!r}, "
                f"expected {expect!r}"
            )
        dtype = _np_dtype(parts[1].decode())
        shape = json.loads(parts[2].decode())
        arr = np.frombuffer(parts[3], dtype=dtype).reshape(shape)
        out.append((name, arr))
    return out
