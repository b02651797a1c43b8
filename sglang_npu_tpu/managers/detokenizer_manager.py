"""Incremental detokenization stage.

Counterpart of the reference's `srt/managers/detokenizer_manager.py`
(`DetokenizerManager:68`, `DecodeStatus:57`, `event_loop:106`): consumes
`BatchTokenIDOut` from the scheduler, incrementally decodes with
surrogate-safe offsets, trims matched stop strings, and forwards
`BatchStrOut`.  Runs on its own thread within the host process.
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
from typing import Dict

from sglang_npu_tpu.managers.io_struct import BatchStrOut, BatchTokenIDOut

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class DecodeStatus:
    decoded_text: str = ""
    decode_ids: list = dataclasses.field(default_factory=list)
    read_offset: int = 0  # tokens already reflected in decoded_text


class DetokenizerManager:
    def __init__(self, tokenizer, input_queue: queue.Queue, output_queue: queue.Queue):
        self.tokenizer = tokenizer
        self.input_queue = input_queue
        self.output_queue = output_queue
        self.decode_status: Dict[str, DecodeStatus] = {}
        self._running = True

    def event_loop(self):
        while self._running:
            try:
                item = self.input_queue.get(timeout=1.0)
            except queue.Empty:
                continue
            if item is None:
                self._running = False
                break
            if isinstance(item, BatchTokenIDOut):
                self.output_queue.put(self.handle_batch(item))
            else:
                # pass through control outputs
                self.output_queue.put(item)

    def shutdown(self):
        self._running = False
        self.input_queue.put(None)

    # ------------------------------------------------------------------
    def handle_batch(self, b: BatchTokenIDOut) -> BatchStrOut:
        output_strs = []
        for i, rid in enumerate(b.rids):
            st = self.decode_status.setdefault(rid, DecodeStatus())
            st.decode_ids.extend(b.output_ids[i])
            finished = b.finished_reasons[i] is not None

            if self.tokenizer is None:
                new_text = ""
            else:
                full = self.tokenizer.decode(
                    st.decode_ids,
                    skip_special_tokens=b.skip_special_tokens[i],
                    spaces_between_special_tokens=b.spaces_between_special_tokens[i],
                )
                if not finished and full.endswith("�"):
                    # hold back incomplete utf-8 / partial BPE sequence
                    new_text = ""
                    full = st.decoded_text
                else:
                    new_text = full[len(st.decoded_text) :]
                st.decoded_text = full

            # decorate logprob entries with decoded token strings
            if self.tokenizer is not None and b.output_token_logprobs:
                entries = b.output_token_logprobs[i]
                if entries:
                    for e in entries:
                        if e[2] is None:
                            e[2] = self.tokenizer.decode([e[1]])
                tops = b.output_top_logprobs[i] if b.output_top_logprobs else None
                if tops:
                    for step in tops:
                        for e in step:
                            if e[2] is None:
                                e[2] = self.tokenizer.decode([e[1]])

            if finished:
                reason = b.finished_reasons[i]
                matched = reason.get("matched") if isinstance(reason, dict) else None
                if (
                    isinstance(matched, str)
                    and matched
                    and not b.no_stop_trim[i]
                ):
                    # trim text at the stop string (reference `:113`)
                    pos = st.decoded_text.find(matched)
                    if pos != -1:
                        trimmed = st.decoded_text[:pos]
                        cut = len(st.decoded_text) - len(trimmed)
                        new_text = new_text[: max(len(new_text) - cut, 0)]
                        st.decoded_text = trimmed
                self.decode_status.pop(rid, None)
            output_strs.append(new_text)

        return BatchStrOut(
            rids=b.rids,
            finished_reasons=b.finished_reasons,
            output_strs=output_strs,
            output_ids=b.output_ids,
            prompt_tokens=b.prompt_tokens,
            completion_tokens=b.completion_tokens,
            cached_tokens=b.cached_tokens,
            spec_accepted_tokens=b.spec_accepted_tokens,
            time_stats=b.time_stats,
            input_token_logprobs=b.input_token_logprobs,
            output_token_logprobs=b.output_token_logprobs,
            input_top_logprobs=b.input_top_logprobs,
            output_top_logprobs=b.output_top_logprobs,
        )


def run_detokenizer_thread(d: DetokenizerManager) -> threading.Thread:
    t = threading.Thread(target=d.event_loop, daemon=True, name="detokenizer")
    t.start()
    return t
