"""PD-disaggregation KV transfer engines.

Counterpart of the reference's `srt/disaggregation/` transfer layer
(`base/conn.py` BaseKVSender/Receiver ABCs, `mooncake/conn.py` RDMA
engine with bootstrap-room handshake, `fake/conn.py` mock): TPU has no
GPUDirect-RDMA path, so the engines here move the host-gathered KV
slab over the best channel available and rendezvous with the decode
server through a ROOM — a decode-side mailbox keyed by an opaque id,
registered before (or after) the bytes arrive, so the router never
relays KV payloads (the old proxy mode shipped every byte
prefill→router→decode; rooms ship them prefill→decode once).

Engines:
  * ``http``  — direct POST of the packed payload to the decode
    server's ``/receive_prefill`` with an ``X-Room`` header.
  * ``shm``   — same-host fast path: the slab is written to /dev/shm
    and only the metadata (path, dtype, shape) travels over HTTP; the
    decode side memory-maps and unlinks it.  ~zero-copy for colocated
    prefill/decode pairs.
  * ``fake``  — instant-success in-process mock (warmup, tests),
    reference `fake/conn.py`.
"""

from __future__ import annotations

import io
import os
import uuid
from typing import Any, Dict, Optional, Tuple

import numpy as np

SHM_DIR = os.environ.get("SGLANG_PD_SHM_DIR", "/dev/shm")


class DeviceKV:
    """Device-path KV handoff (reference design point: mooncake
    `TransferEngine`, `disaggregation/mooncake/conn.py:1` — there RDMA
    NIC-to-NIC; here the gathered rows STAY a jax device array and the
    decode engine reshards them onto its own mesh with `device_put`, so
    on hardware the bytes ride ICI/DCN and never touch the host).  Only
    valid when prefill and decode engines share a process/slice
    (`--pd-device-handoff`); cross-cluster pairs keep the host engines."""

    def __init__(self, rows, n: int):
        self.rows = rows  # jax.Array [L, 2, H, padded, D] (pool layout)
        self.n = n

    @property
    def nbytes(self) -> int:
        return self.rows.size * self.rows.dtype.itemsize


# ----------------------------------------------------------------------
# Payload codec (shared by every engine and both transfer directions)
# ----------------------------------------------------------------------
def encode_payload(handoff) -> Tuple[bytes, Dict[str, str]]:
    """Pack a scheduler KV handoff into (body, headers).  bf16 has no
    portable npz dtype: raw bytes + dtype/shape travel separately."""
    kv = np.ascontiguousarray(handoff.kv_data)
    buf = io.BytesIO()
    np.savez(
        buf,
        kv_bytes=kv.view(np.uint8).reshape(-1),
        kv_shape=np.asarray(kv.shape, np.int64),
        fill_ids=np.asarray(handoff.fill_ids, np.int64),
        first_token=np.asarray([handoff.first_token]),
    )
    headers = {"X-Rid": handoff.rid, "X-Kv-Dtype": str(kv.dtype)}
    return buf.getvalue(), headers


class _Handoff:
    rid: str
    fill_ids: list
    first_token: int
    kv_data: np.ndarray


def decode_payload(raw: bytes, headers) -> _Handoff:
    """Inverse of encode_payload; also resolves shm-metadata payloads."""
    import ml_dtypes  # noqa: F401  (registers bfloat16 with numpy)

    h = _Handoff()
    h.rid = headers.get("X-Rid", "") or uuid.uuid4().hex
    kv_dtype = np.dtype(headers.get("X-Kv-Dtype", "bfloat16"))
    shm_path = headers.get("X-Kv-Shm", "")
    data = np.load(io.BytesIO(raw))
    h.fill_ids = data["fill_ids"].tolist()
    h.first_token = int(data["first_token"][0])
    shape = tuple(data["kv_shape"].tolist())
    if shm_path:
        # same-host fast path: bytes live in /dev/shm, unlink after read
        try:
            flat = np.fromfile(shm_path, dtype=np.uint8)
        finally:
            try:
                os.unlink(shm_path)
            except OSError:
                pass
        h.kv_data = flat.view(kv_dtype).reshape(shape)
    else:
        h.kv_data = data["kv_bytes"].view(kv_dtype).reshape(shape)
    return h


def encode_shm_payload(handoff) -> Tuple[bytes, Dict[str, str]]:
    """Write the KV slab to /dev/shm; body carries only metadata."""
    kv = np.ascontiguousarray(handoff.kv_data)
    # pid-qualified: parallel engines (xdist test workers, multi-server
    # hosts) may reuse rid strings — the receiver gets the path via the
    # X-Kv-Shm header, so the name only needs to be collision-free
    path = os.path.join(
        SHM_DIR, f"sglang_pd_{os.getpid()}_{handoff.rid}.bin"
    )
    kv.view(np.uint8).reshape(-1).tofile(path)
    buf = io.BytesIO()
    np.savez(
        buf,
        kv_shape=np.asarray(kv.shape, np.int64),
        fill_ids=np.asarray(handoff.fill_ids, np.int64),
        first_token=np.asarray([handoff.first_token]),
    )
    headers = {
        "X-Rid": handoff.rid,
        "X-Kv-Dtype": str(kv.dtype),
        "X-Kv-Shm": path,
    }
    return buf.getvalue(), headers


# ----------------------------------------------------------------------
# Senders (prefill side) — async, driven from the http server loop
# ----------------------------------------------------------------------
class BaseKVSender:
    """Reference `base/conn.py` BaseKVSender: one send per handoff."""

    name = "base"

    async def send(self, session, decode_url: str, room: str, handoff):
        raise NotImplementedError


class HttpKVSender(BaseKVSender):
    name = "http"

    def _encode(self, handoff):
        return encode_payload(handoff)

    async def send(self, session, decode_url: str, room: str, handoff):
        body, headers = self._encode(handoff)
        headers["X-Room"] = room
        async with session.post(
            decode_url.rstrip("/") + "/receive_prefill",
            data=body,
            headers=headers,
        ) as r:
            if r.status != 200:
                raise RuntimeError(
                    f"KV transfer rejected ({r.status}): {await r.text()}"
                )


class ShmKVSender(HttpKVSender):
    name = "shm"

    def _encode(self, handoff):
        return encode_shm_payload(handoff)


class FakeKVSender(BaseKVSender):
    """Instant-success mock; payloads land in ``sent`` for assertions."""

    name = "fake"
    sent: list = []

    async def send(self, session, decode_url: str, room: str, handoff):
        FakeKVSender.sent.append((decode_url, room, handoff))


_SENDERS = {c.name: c for c in (HttpKVSender, ShmKVSender, FakeKVSender)}


def get_kv_sender(name: str) -> BaseKVSender:
    try:
        return _SENDERS[name]()
    except KeyError:
        raise ValueError(
            f"unknown pd transfer engine {name!r} "
            f"(choose from {sorted(_SENDERS)})"
        )


# ----------------------------------------------------------------------
# Rooms (decode side) — rendezvous of registration with KV arrival
# ----------------------------------------------------------------------
class RoomTable:
    """Decode-side bootstrap rooms (reference mooncake room handshake):
    either side may arrive first; `wait` resolves once both have."""

    def __init__(self):
        import asyncio

        self._asyncio = asyncio
        self._rooms: Dict[str, Any] = {}

    def _room(self, room: str):
        if room not in self._rooms:
            self._rooms[room] = {
                "evt": self._asyncio.Event(),
                "handoff": None,
            }
        return self._rooms[room]

    def deliver(self, room: str, handoff) -> None:
        r = self._room(room)
        r["handoff"] = handoff
        r["evt"].set()

    async def wait(self, room: str, timeout: float = 600.0):
        r = self._room(room)
        try:
            await self._asyncio.wait_for(r["evt"].wait(), timeout)
        finally:
            self._rooms.pop(room, None)
        return r["handoff"]
