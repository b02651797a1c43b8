"""Multi-turn session control.

Counterpart of the reference's `srt/managers/session_controller.py`
(`Session:158`): the server keeps per-session token history so clients send
only the delta each turn; KV reuse comes from the radix prefix cache (the
session history IS the shared prefix).
"""

from __future__ import annotations

import dataclasses
import time
import uuid
from typing import Dict, List, Optional


@dataclasses.dataclass
class Session:
    session_id: str
    history_ids: List[int] = dataclasses.field(default_factory=list)
    last_active: float = dataclasses.field(default_factory=time.time)
    capacity_of_str_len: int = 0


class SessionController:
    def __init__(self):
        self.sessions: Dict[str, Session] = {}

    def open(self, session_id: Optional[str] = None, capacity: int = 0) -> str:
        sid = session_id or uuid.uuid4().hex
        if sid in self.sessions:
            return sid
        self.sessions[sid] = Session(session_id=sid, capacity_of_str_len=capacity)
        return sid

    def close(self, session_id: str) -> None:
        self.sessions.pop(session_id, None)

    def get(self, session_id: str) -> Optional[Session]:
        return self.sessions.get(session_id)

    def prepare_input(self, session_id: str, delta_ids: List[int]) -> List[int]:
        """Full input = stored history + this turn's delta."""
        s = self.sessions.get(session_id)
        if s is None:
            return list(delta_ids)
        s.last_active = time.time()
        return s.history_ids + list(delta_ids)

    def record_turn(self, session_id: str, full_ids: List[int], output_ids: List[int]):
        s = self.sessions.get(session_id)
        if s is None:
            return
        s.history_ids = list(full_ids) + list(output_ids)
        s.last_active = time.time()
