"""Request lifecycle and batch construction.

Behavioral counterpart of the reference's `srt/managers/schedule_batch.py`
(`Req:412`, `ScheduleBatch:804`, `prepare_for_extend:1122`,
`prepare_for_decode:1519`, `retract_decode:1378`, `filter_batch:1591`,
`merge_batch:1648`) re-designed for the TPU execution model:

  * All per-batch state here is **host numpy**; the ModelRunner pads it into
    a small set of static shapes (jit bucket ladder) and uploads once.
  * KV bookkeeping is the page/slot scheme of `mem_cache/allocator.py` —
    each request carries a growing int32 array of token slot ids whose page
    view becomes the device page table row.
"""

from __future__ import annotations

import dataclasses
import logging
from enum import Enum, auto
from typing import Any, Dict, List, Optional

import numpy as np

from sglang_npu_tpu.mem_cache.allocator import PagedAllocator
from sglang_npu_tpu.mem_cache.radix_cache import BasePrefixCache, TreeNode
from sglang_npu_tpu.sampling.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


# ----------------------------------------------------------------------
# Finish reasons (reference `FINISH_*` classes, schedule_batch.py:121-165)
# ----------------------------------------------------------------------
class BaseFinishReason:
    def __init__(self, is_error: bool = False):
        self.is_error = is_error

    def to_json(self) -> Dict[str, Any]:
        raise NotImplementedError


class FINISH_MATCHED_TOKEN(BaseFinishReason):
    def __init__(self, matched: int):
        super().__init__()
        self.matched = matched

    def to_json(self):
        return {"type": "stop", "matched": self.matched}


class FINISH_MATCHED_STR(BaseFinishReason):
    def __init__(self, matched: str):
        super().__init__()
        self.matched = matched

    def to_json(self):
        return {"type": "stop", "matched": self.matched}


class FINISH_LENGTH(BaseFinishReason):
    def __init__(self, length: int):
        super().__init__()
        self.length = length

    def to_json(self):
        return {"type": "length", "length": self.length}


class FINISH_ABORT(BaseFinishReason):
    def __init__(self, message: str = "aborted"):
        super().__init__(is_error=True)
        self.message = message

    def to_json(self):
        return {"type": "abort", "message": self.message}


# ----------------------------------------------------------------------
class Req:
    """One in-flight generation request (reference `Req:412`)."""

    def __init__(
        self,
        rid: str,
        origin_input_text: Optional[str],
        origin_input_ids: List[int],
        sampling_params: SamplingParams,
        eos_token_ids: Optional[set] = None,
        stream: bool = False,
        return_logprob: bool = False,
        top_logprobs_num: int = 0,
        logprob_start_len: int = -1,
        lora_path: Optional[str] = None,
        grammar: Any = None,
    ):
        self.rid = rid
        self.origin_input_text = origin_input_text
        self.origin_input_ids = list(origin_input_ids)
        self.sampling_params = sampling_params
        self.eos_token_ids = eos_token_ids or set()
        self.stream = stream
        self.lora_path = lora_path
        self.grammar = grammar

        self.output_ids: List[int] = []
        self.fill_ids: List[int] = list(origin_input_ids)

        # KV bookkeeping
        self.prefix_len: int = 0  # tree-owned prefix tokens
        self.kv_slots: np.ndarray = np.empty((0,), dtype=np.int32)
        self.pages: List[int] = []
        # DP-attention: page-allocation rank (model_executor/dp_attention.py)
        self.dp_rank: int = 0
        # Sliding-window models: ring of pages in the window pool; slot r
        # holds pages with index ≡ r (mod NW).  Grown lazily to NW pages,
        # then reused in place (ops/hybrid_kv.py).
        self.swa_pages: List[int] = []
        self.swa_snapshot_src = None  # tree node backing a snapshot match

        # Multimodal (models/qwen2_5_vl.py): processor outputs + per-req
        # vision-embedding cache (device array, filled by the runner on
        # the first prefill chunk)
        self.mm_inputs: Optional[Dict[str, Any]] = None
        self.cache_key_ids: Optional[List[int]] = None
        self.mm_embeds = None  # device [n_image_tokens, hidden]
        self.mm_token_positions: Optional[np.ndarray] = None
        self.mm_groups_prompt: Optional[np.ndarray] = None  # [T_prompt]
        self.mrope_positions: Optional[np.ndarray] = None  # [3, T_prompt]
        self.mrope_delta: int = 0
        self.last_node: Optional[TreeNode] = None
        self.locked_node: Optional[TreeNode] = None  # the ONE lock we hold
        self.req_pool_idx: Optional[int] = None
        # Tokens of this request's prefix being restored from a lower
        # HiCache tier; >0 defers admission (PrefillAdder skips the req).
        self.prefix_loading: int = 0

        # Chunked prefill: number of fill_ids already forwarded.
        self.extend_input_len: int = 0
        self.is_chunked: int = 0

        # Logprobs
        self.return_logprob = return_logprob
        self.top_logprobs_num = top_logprobs_num
        self.logprob_start_len = logprob_start_len
        self.input_token_logprobs: Optional[list] = None
        self.output_token_logprobs: list = []
        self.output_top_logprobs: list = []
        self.input_top_logprobs: Optional[list] = None
        # Next absolute position whose input logprob is still needed.
        # Advances chunk by chunk so chunked prefill of a long logprob
        # region makes progress (advisor: capping the prefix at
        # logprob_start_len on every round livelocked /v1/score on prompts
        # longer than chunked_prefill_size).
        self.logprob_cursor: int = max(logprob_start_len, 0)

        # Status
        self.finished_reason: Optional[BaseFinishReason] = None
        self.to_abort = False
        self.cached_tokens = 0
        self.stream_sent = 0  # output tokens already emitted downstream
        self.spec_accepted_tokens = 0

        # Detokenization state lives downstream (DetokenizerManager); the
        # scheduler only keeps a tail decode for stop-string matching.
        self.decoded_tail = ""
        self.vid = 0  # version id for overlap-safety on retraction

        # per-stage time stats (reference Req.time_stats): admission,
        # first forward, first output token, finish
        self.queue_time: Optional[float] = None
        self.forward_entry_time: Optional[float] = None
        self.first_token_time: Optional[float] = None
        self.finish_time: Optional[float] = None
        self.created_time: Optional[float] = None

        # EAGLE speculative state (hidden-buffer slot + lifecycle flags)
        self.hidden_slot: Optional[int] = None
        self.eagle_started = False  # first prefill chunk done
        self.eagle_ready = False  # draft KV/hidden valid for spec rounds

        # mllama-class cross-attention (models/mllama.py): vision-KV slot
        # + mask geometry; mm_cross_prepared flips once the tower ran
        self.mm_slot_cross: Optional[int] = None
        self.mm_first_pos: int = 0
        self.mm_vis_len: int = 0
        self.mm_vis_total: int = 0
        self.mm_cross_prepared = False

    # ------------------------------------------------------------------
    def set_mm_inputs(self, mm: Dict[str, Any]) -> None:
        self.mm_inputs = mm
        # radix keys: image pad tokens replaced by content-hash ids so
        # identical images share prefix KV (reference mm hashing)
        self.cache_key_ids = list(mm["key_ids"])
        ids = np.asarray(self.origin_input_ids)
        # extra_token_ids: additional placeholder ids whose positions are
        # also tower-filled (phi4mm serves image AND audio tokens in one
        # prompt; the model returns rows in prompt-position order)
        tids = [mm["image_token_id"]] + [
            int(t) for t in mm.get("extra_token_ids", ())
        ]
        self.mm_token_positions = np.where(np.isin(ids, tids))[0]
        # per-prompt-position image index (-1 text): contiguous placeholder
        # runs are numbered in order (gemma3 same-image bidirectional mask)
        grp = np.full(len(ids), -1, dtype=np.int32)
        gi = 0
        in_run = False
        for i, t in enumerate(ids):
            if t == mm["image_token_id"]:
                if not in_run:
                    in_run = True
                grp[i] = gi
            else:
                if in_run:
                    gi += 1
                in_run = False
        self.mm_groups_prompt = grp
        mp = mm.get("mrope_positions")  # qwen-vl only; plain towers use 1D
        self.mrope_positions = (
            np.asarray(mp, dtype=np.int32) if mp is not None else None
        )
        self.mrope_delta = int(mm.get("mrope_delta", 0))

    def cache_key_seq(self) -> List[int]:
        """Token sequence used for radix matching/insertion (content-hash
        substituted for image pad tokens)."""
        if self.cache_key_ids is None:
            return self.fill_ids
        return self.cache_key_ids + self.output_ids

    # ------------------------------------------------------------------
    @property
    def seq_len(self) -> int:
        return len(self.fill_ids)

    @property
    def finished(self) -> bool:
        return self.finished_reason is not None

    def init_next_round_input(self, tree_cache: BasePrefixCache, page_size: int = 1) -> None:
        """Refresh fill_ids and re-match the radix prefix before a prefill
        round (reference `Req.init_next_round_input`)."""
        self.fill_ids = self.origin_input_ids + self.output_ids
        # Never reuse the *entire* input (we need >=1 token to compute
        # logits), and keep the reused prefix page-aligned — a request's own
        # slots must always start at a page boundary (tree pages are full).
        max_prefix = (len(self.fill_ids) - 1) // page_size * page_size
        if self.return_logprob and self.logprob_start_len >= 0:
            # Input-logprob positions must be recomputed, not cache-hit —
            # but only those not yet accumulated by earlier chunks.  The
            # cursor's logprob needs logits at cursor-1, so the reusable
            # prefix may reach cursor-1 once past the first chunk.
            if self.logprob_cursor > self.logprob_start_len:
                cap = max(self.logprob_cursor - 1, 0)
            else:
                cap = self.logprob_start_len
            max_prefix = min(max_prefix, cap // page_size * page_size)
        kwargs = {"namespace": getattr(self, "lora_id", 0) or 0}
        if getattr(tree_cache, "is_swa", False):
            if self.swa_pages:
                # chunked/continuing request: its own ring covers exactly
                # its committed tokens — no snapshot needed, but the match
                # must not exceed the ring's coverage
                max_prefix = min(max_prefix, len(self.kv_slots))
                kwargs["ring_ok"] = True
        # The key is capped BEFORE matching so a snapshot match (which must
        # end exactly at the cached length) sees the usable length.
        res = tree_cache.match_prefix(self.cache_key_seq()[:max_prefix], **kwargs)
        matched = res.device_indices
        # Defer on an async tier restore only if the loading tokens would
        # actually extend the usable (capped) prefix.
        self.prefix_loading = (
            getattr(res, "loading", 0) if len(matched) < max_prefix else 0
        )
        if len(matched) > max_prefix:
            matched = matched[:max_prefix]
        self.prefix_len = len(matched)
        self.kv_slots = np.asarray(matched, dtype=np.int32)
        self.last_node = res.last_node
        self.swa_snapshot_src = res.swa_snapshot_node
        self.cached_tokens = max(self.cached_tokens, self.prefix_len)
        self.extend_input_len = len(self.fill_ids) - self.prefix_len

    def reset_for_retract(self) -> None:
        if self.grammar is not None:
            # replayed tokens will be re-accepted during the re-prefill...
            # actually re-prefill does not re-run accept_token; keep the FSM
            # state as-is (it already reflects output_ids, which survive).
            pass
        self.prefix_len = 0
        self.kv_slots = np.empty((0,), dtype=np.int32)
        self.pages = []
        self.swa_pages = []
        self.swa_snapshot_src = None
        self.last_node = None
        self.prefix_loading = 0
        self.locked_node = None
        self.extend_input_len = 0
        self.vid += 1
        self.eagle_started = False
        self.eagle_ready = False

    # ------------------------------------------------------------------
    def check_finished(self, stop_tokenizer=None) -> None:
        if self.finished:
            return
        if self.to_abort:
            self.finished_reason = FINISH_ABORT()
            return
        sp = self.sampling_params
        if len(self.output_ids) >= sp.max_new_tokens:
            self.finished_reason = FINISH_LENGTH(sp.max_new_tokens)
            return
        if len(self.output_ids) < sp.min_new_tokens:
            return
        last = self.output_ids[-1]
        if not sp.ignore_eos and last in self.eos_token_ids:
            self.finished_reason = FINISH_MATCHED_TOKEN(last)
            return
        if last in sp.stop_token_ids:
            self.finished_reason = FINISH_MATCHED_TOKEN(last)
            return
        if sp.stop_strs and stop_tokenizer is not None:
            tail_len = sp.stop_str_max_len + 8
            tail = stop_tokenizer.decode(self.output_ids[-tail_len:])
            for s in sp.stop_strs:
                if s in tail:
                    self.finished_reason = FINISH_MATCHED_STR(s)
                    return

    def __repr__(self):
        return (
            f"Req(rid={self.rid}, in={len(self.origin_input_ids)}, "
            f"out={len(self.output_ids)}, prefix={self.prefix_len})"
        )


# ----------------------------------------------------------------------
class ForwardMode(Enum):
    EXTEND = auto()
    DECODE = auto()
    IDLE = auto()
    TARGET_VERIFY = auto()
    DRAFT_EXTEND = auto()

    def is_extend(self):
        return self in (ForwardMode.EXTEND, ForwardMode.DRAFT_EXTEND)

    def is_decode(self):
        return self == ForwardMode.DECODE


@dataclasses.dataclass
class ModelWorkerBatch:
    """Host-numpy view of a batch handed to the ModelRunner (reference
    `ModelWorkerBatch:1850`).  The runner pads these to jit buckets."""

    forward_mode: ForwardMode
    input_ids: np.ndarray  # [T] tokens to forward this step
    positions: np.ndarray  # [T] absolute positions of those tokens
    seq_lens: np.ndarray  # [B] total seq len per req after this step
    out_slots: np.ndarray  # [T] KV slot each new token writes to
    page_tables: np.ndarray  # [B, max_pages] page ids per req (0-padded)
    extend_seq_lens: Optional[np.ndarray]  # [B] extend token counts
    extend_prefix_lens: Optional[np.ndarray]  # [B]
    sampling_info: "SamplingBatchNumpy"
    rids: List[str]
    real_bs: int
    # multi-step decode: device runs this many steps per dispatch, feeding
    # sampled tokens back on-device; [B] per-req fill-length limits.
    decode_steps: int = 1
    decode_limits: Optional[np.ndarray] = None
    # per-row max_new_tokens budget remaining AFTER this window — lets a
    # chained window (prepared before this one's results land) derive its
    # own limits without host token counts (prepare_for_decode_chained)
    decode_budget_after: Optional[np.ndarray] = None
    # speculative round: decode_steps = num_draft_tokens + 1
    spec: bool = False
    # logprob plumbing
    return_logprob: bool = False
    top_logprobs_k: int = 0
    return_input_logprob: bool = False
    # LoRA adapter slot per request (0 = no adapter); None when disabled
    lora_ids: Optional[np.ndarray] = None
    # EAGLE: per-request hidden-state buffer slots ([B] int32) and
    # first-chunk flags (no boundary hidden exists yet)
    hidden_slots: Optional[np.ndarray] = None
    eagle_first: Optional[np.ndarray] = None
    # On-device grammar FSM for fused multi-step constrained decode:
    # (device_grammars, gidx [B], gstate [B], vocab) — constrained/device_fsm.py
    grammar_fsm: Optional[tuple] = None
    # Sliding-window models: [B, NW] ring page table for the window pool
    swa_page_tables: Optional[np.ndarray] = None
    # Multimodal: per-batch-row Req handles (None rows = text-only), flat
    # [T, 3] mrope positions (extend) / [B] mrope deltas (decode)
    mm_reqs: Optional[List] = None
    mrope_positions: Optional[np.ndarray] = None
    mrope_delta: Optional[np.ndarray] = None
    # DP-attention: per-request page-allocation rank [B]
    dp_ranks: Optional[np.ndarray] = None
    # mllama-class cross-attention: per-request vision-KV slot / first
    # image position / allowed+total vision token counts ([B] int32)
    mm_slots: Optional[np.ndarray] = None
    mm_first_pos: Optional[np.ndarray] = None
    mm_vis_len: Optional[np.ndarray] = None
    mm_vis_total: Optional[np.ndarray] = None

    @property
    def batch_size(self) -> int:
        return len(self.seq_lens)


@dataclasses.dataclass
class SamplingBatchNumpy:
    """Tensorized per-request sampling knobs (host side).

    Penalty state travels as padded token *history* (prompt+output ids) —
    the device rebuilds count tensors with a scatter-add inside the jit
    region, so multi-step decode windows can update them on-device per step
    (reference `sampling/penaltylib/` keeps [B, vocab] cumulative tensors on
    the GPU; transferring those per step is infeasible over narrow links).
    """

    temperatures: np.ndarray  # [B]
    top_ps: np.ndarray  # [B]
    top_ks: np.ndarray  # [B]
    min_ps: np.ndarray  # [B]
    is_all_greedy: bool
    frequency_penalties: Optional[np.ndarray] = None  # [B]
    presence_penalties: Optional[np.ndarray] = None  # [B]
    repetition_penalties: Optional[np.ndarray] = None  # [B]
    has_penalties: bool = False
    token_hist: Optional[np.ndarray] = None  # [B, H] padded with -1
    hist_is_output: Optional[np.ndarray] = None  # [B, H] bool
    # grammar: packed uint32 allowed-token bitmask [B, ceil(V/32)]
    vocab_mask: Optional[np.ndarray] = None
    has_grammar: bool = False
    # min_new_tokens: EOS/stop-token logits are masked on device until the
    # minimum is reached (reference penaltylib min_new_tokens; merely
    # suppressing the finish check left premature EOS text in outputs).
    min_new_remaining: Optional[np.ndarray] = None  # [B] int32
    stop_mask_tokens: Optional[np.ndarray] = None  # [B, S] int32, -1 padded
    has_min_new: bool = False
    # OpenAI logit_bias: sparse per-request (token id, bias) pairs; ids
    # padded with an out-of-vocab sentinel so the device scatter drops them
    logit_bias_ids: Optional[np.ndarray] = None  # [B, K] int32
    logit_bias_vals: Optional[np.ndarray] = None  # [B, K] f32
    has_logit_bias: bool = False
    # custom logit processors (sampling/custom_logit_processor.py): the
    # static per-batch processor-key tuple + per-row slot + packed params
    custom_proc_keys: Optional[tuple] = None
    custom_slot: Optional[np.ndarray] = None  # [B] int32, -1 = none
    custom_params: Optional[dict] = None  # key -> [B] / [B, K] np arrays

    @classmethod
    def from_reqs(cls, reqs: List[Req]) -> "SamplingBatchNumpy":
        temps = np.array(
            [r.sampling_params.temperature for r in reqs], dtype=np.float32
        )
        top_ps = np.array([r.sampling_params.top_p for r in reqs], dtype=np.float32)
        top_ks = np.array(
            [r.sampling_params.effective_top_k for r in reqs], dtype=np.int32
        )
        min_ps = np.array([r.sampling_params.min_p for r in reqs], dtype=np.float32)
        is_all_greedy = all(r.sampling_params.is_greedy for r in reqs)
        out = cls(temps, top_ps, top_ks, min_ps, is_all_greedy)

        has_pen = any(
            r.sampling_params.frequency_penalty != 0.0
            or r.sampling_params.presence_penalty != 0.0
            or r.sampling_params.repetition_penalty != 1.0
            for r in reqs
        )
        if has_pen:
            out.has_penalties = True
            out.frequency_penalties = np.array(
                [r.sampling_params.frequency_penalty for r in reqs], np.float32
            )
            out.presence_penalties = np.array(
                [r.sampling_params.presence_penalty for r in reqs], np.float32
            )
            out.repetition_penalties = np.array(
                [r.sampling_params.repetition_penalty for r in reqs], np.float32
            )
            H = max(len(r.fill_ids) for r in reqs)
            H = max(1 << (H - 1).bit_length(), 16)
            hist = np.full((len(reqs), H), -1, dtype=np.int32)
            is_out = np.zeros((len(reqs), H), dtype=bool)
            for i, r in enumerate(reqs):
                n = len(r.fill_ids)
                hist[i, :n] = r.fill_ids
                n_in = len(r.origin_input_ids)
                is_out[i, n_in:n] = True
            out.token_hist = hist
            out.hist_is_output = is_out

        if any(
            len(r.output_ids) < r.sampling_params.min_new_tokens for r in reqs
        ):
            out.has_min_new = True
            remaining = np.array(
                [
                    max(r.sampling_params.min_new_tokens - len(r.output_ids), 0)
                    for r in reqs
                ],
                dtype=np.int32,
            )
            per_req = []
            for r in reqs:
                toks = set(r.sampling_params.stop_token_ids)
                if not r.sampling_params.ignore_eos:
                    toks |= set(r.eos_token_ids)
                per_req.append(sorted(toks))
            S = max(max((len(t) for t in per_req), default=1), 1)
            stop = np.full((len(reqs), S), -1, dtype=np.int32)
            for i, t in enumerate(per_req):
                stop[i, : len(t)] = t
            out.min_new_remaining = remaining
            out.stop_mask_tokens = stop

        if any(r.sampling_params.logit_bias for r in reqs):
            out.has_logit_bias = True
            K = max(
                max(
                    (len(r.sampling_params.logit_bias or {}) for r in reqs),
                    default=1,
                ),
                1,
            )
            SENTINEL = 1 << 30  # out-of-vocab: device scatter drops it
            ids = np.full((len(reqs), K), SENTINEL, dtype=np.int32)
            vals = np.zeros((len(reqs), K), dtype=np.float32)
            for i, r in enumerate(reqs):
                lb = r.sampling_params.logit_bias or {}
                for j, (tid, b) in enumerate(sorted(lb.items())):
                    ids[i, j] = tid
                    vals[i, j] = b
            out.logit_bias_ids = ids
            out.logit_bias_vals = vals

        from sglang_npu_tpu.sampling.custom_logit_processor import (
            batch_processors,
        )

        custom = batch_processors(reqs)
        if custom is not None:
            out.custom_proc_keys, out.custom_slot, out.custom_params = custom
        return out


# ----------------------------------------------------------------------
@dataclasses.dataclass
class SWAContext:
    """Window-pool allocation context for sliding-window models: a second
    allocator over the window pool plus the per-request ring size
    (reference `SWATokenToKVPoolAllocator`, `allocator.py:163`)."""

    allocator: PagedAllocator
    ring_pages: int  # NW = ceil(window / page_size) + 1


class ScheduleBatch:
    """A batch of requests scheduled together (reference `ScheduleBatch:804`)."""

    def __init__(
        self,
        reqs: List[Req],
        allocator: PagedAllocator,
        tree_cache: BasePrefixCache,
        swa: Optional[SWAContext] = None,
    ):
        self.reqs = reqs
        self.allocator = allocator
        self.tree_cache = tree_cache
        self.swa = swa
        self.forward_mode: Optional[ForwardMode] = None

    @classmethod
    def init_new(cls, reqs, allocator, tree_cache, swa=None) -> "ScheduleBatch":
        return cls(list(reqs), allocator, tree_cache, swa)

    def is_empty(self) -> bool:
        return len(self.reqs) == 0

    def batch_size(self) -> int:
        return len(self.reqs)

    # ------------------------------------------------------------------
    def _evict_for(self, num_pages: int, rank: int = 0) -> bool:
        """Try to make `num_pages` available (in ``rank``'s partition under
        DP-attention) by evicting the radix tree.  Eviction is LRU-global,
        so loop while it makes progress — freed pages may belong to other
        ranks."""
        ps = self.allocator.page_size
        while self.allocator.available_pages_rank(rank) < num_pages:
            before = self.tree_cache.evictable_size()
            if before <= 0:
                return False
            self.tree_cache.evict(
                (num_pages - self.allocator.available_pages_rank(rank)) * ps
            )
            if self.tree_cache.evictable_size() >= before:  # no progress
                return False
        return True

    def alloc_extend_slots(self, req: Req, new_len: int) -> np.ndarray:
        old_len = len(req.kv_slots)
        rank = req.dp_rank
        need = self.allocator.pages_needed(old_len, new_len)
        if not self._evict_for(need, rank):
            raise RuntimeError("KV cache out of memory during extend alloc")
        slots = self.allocator.alloc_extend(old_len, new_len, req.pages, rank)
        assert slots is not None
        req.kv_slots = np.concatenate([req.kv_slots, slots])
        if self.swa is not None:
            self._alloc_swa_ring(req, new_len)
        return slots

    def _alloc_swa_ring(self, req: Req, new_len: int) -> None:
        """Grow the request's window-pool ring to cover ``new_len`` tokens
        (capped at NW pages; beyond that the ring is reused in place)."""
        nw = self.swa.ring_pages
        ps = self.swa.allocator.page_size
        want = min(nw, -(-new_len // ps))
        grow = want - len(req.swa_pages)
        if grow <= 0:
            return
        pages = self.swa.allocator.alloc_pages(grow)
        if pages is None:
            # window pool exhausted: let the tree give pages back first
            self.tree_cache.evict_swa(grow * ps)
            pages = self.swa.allocator.alloc_pages(grow)
        if pages is None:
            raise RuntimeError("window KV pool out of memory during extend")
        req.swa_pages.extend(pages)

    # ------------------------------------------------------------------
    def prepare_for_extend(self) -> ModelWorkerBatch:
        self.forward_mode = ForwardMode.EXTEND
        input_ids, positions, out_slots = [], [], []
        seq_lens, extend_lens, prefix_lens = [], [], []
        for req in self.reqs:
            # Hold exactly one lock on the request's matched prefix node so
            # eviction can't free in-flight KV (reference inc_lock_ref in
            # PrefillAdder.add_one_req).
            if req.locked_node is not req.last_node:
                if req.locked_node is not None:
                    self.tree_cache.dec_lock_ref(req.locked_node)
                if req.last_node is not None:
                    self.tree_cache.inc_lock_ref(req.last_node)
                req.locked_node = req.last_node
            # Window snapshot reuse: copy the cached ring into this
            # request's own pages while the prefix lock is held (may zero
            # the prefix if the snapshot was just evicted).
            if (
                self.swa is not None
                and req.prefix_len > 0
                and not req.swa_pages
                and getattr(self.tree_cache, "is_swa", False)
            ):
                self.tree_cache.restore_ring(req)
            # fill_ids/prefix were set by init_next_round_input; for chunked
            # prefill the adder already truncated extend_input_len.
            start = req.prefix_len
            end = start + req.extend_input_len
            tokens = req.fill_ids[start:end]
            req.pages = (req.kv_slots[:: self.allocator.page_size] // self.allocator.page_size).astype(int).tolist()
            slots = self.alloc_extend_slots(req, end)
            input_ids.append(np.asarray(tokens, dtype=np.int32))
            positions.append(np.arange(start, end, dtype=np.int32))
            out_slots.append(slots)
            seq_lens.append(end)
            extend_lens.append(end - start)
            prefix_lens.append(start)
        mwb = self._finalize(
            np.concatenate(input_ids),
            np.concatenate(positions),
            np.asarray(seq_lens, dtype=np.int32),
            np.concatenate(out_slots),
            np.asarray(extend_lens, dtype=np.int32),
            np.asarray(prefix_lens, dtype=np.int32),
        )
        if any(r.mm_inputs is not None for r in self.reqs):
            from sglang_npu_tpu.multimodal.processor import extend_mrope

            mwb.mm_reqs = [
                r if r.mm_inputs is not None else None for r in self.reqs
            ]
            rows = []
            for req in self.reqs:
                start = req.prefix_len
                end = start + req.extend_input_len
                if req.mrope_positions is not None:
                    req.mrope_positions = extend_mrope(
                        req.mrope_positions, req.mrope_delta, end
                    )
                    rows.append(req.mrope_positions[:, start:end].T)
                else:
                    r = np.arange(start, end, dtype=np.int32)
                    rows.append(np.stack([r, r, r], axis=1))
            mwb.mrope_positions = np.concatenate(rows, axis=0)
        return mwb

    # ------------------------------------------------------------------
    def prepare_for_decode(self, decode_steps: int = 1) -> ModelWorkerBatch:
        """Allocate KV for up to ``decode_steps`` tokens per request and
        build the decode batch.  The device computes per-step write slots
        from the page table, so only page tables + lengths travel."""
        self.forward_mode = ForwardMode.DECODE
        input_ids = np.array([r.fill_ids[-1] for r in self.reqs], dtype=np.int32)
        positions = np.array([r.seq_len - 1 for r in self.reqs], dtype=np.int32)
        seq_lens = np.array([r.seq_len for r in self.reqs], dtype=np.int32)
        out_slots = np.zeros((len(self.reqs), decode_steps), dtype=np.int32)
        limits = np.empty((len(self.reqs),), dtype=np.int32)
        for i, req in enumerate(self.reqs):
            # KV covers seq_len-1 tokens; the window feeds tokens at
            # positions [seq_len-1, seq_len-1+K), so allocate K more slots.
            slots = self.alloc_extend_slots(req, req.seq_len - 1 + decode_steps)
            assert len(slots) == decode_steps
            out_slots[i] = slots
            remaining = req.sampling_params.max_new_tokens - len(req.output_ids)
            limits[i] = req.seq_len + min(max(remaining, 0), decode_steps)
        mwb = self._finalize(input_ids, positions, seq_lens, out_slots, None, None)
        mwb.decode_steps = decode_steps
        mwb.decode_limits = limits
        rem0 = np.array(
            [
                r.sampling_params.max_new_tokens - len(r.output_ids)
                for r in self.reqs
            ],
            dtype=np.int32,
        )
        mwb.decode_budget_after = rem0 - (limits - seq_lens)
        if any(r.mm_inputs is not None for r in self.reqs):
            mwb.mrope_delta = np.array(
                [r.mrope_delta for r in self.reqs], dtype=np.int32
            )
        return mwb

    def prepare_for_decode_chained(self, prev: ModelWorkerBatch) -> ModelWorkerBatch:
        """Build the NEXT decode window while ``prev`` is still in flight:
        geometry derives purely from prev's device-side fill advance
        (final fill == prev.decode_limits by construction), and the input
        tokens stay on device (ModelRunner.decode_dispatch chain_from) —
        the TPU redesign of the reference overlap worker's future-token
        map (`tp_worker_overlap_thread.py:45`).  Composition must equal
        prev's (the caller checks rids)."""
        assert prev.decode_limits is not None
        K = prev.decode_steps
        lens_next = prev.decode_limits.astype(np.int32).copy()
        limits = np.empty_like(lens_next)
        out_slots = np.zeros((len(self.reqs), K), dtype=np.int32)
        self.forward_mode = ForwardMode.DECODE
        for i, req in enumerate(self.reqs):
            # fill after prev may exceed host kv_slots; top up to cover
            # this window's writes at positions [lens_next-1, limits-1]
            target = int(lens_next[i]) - 1 + K
            if target > len(req.kv_slots):
                slots = self.alloc_extend_slots(req, target)
                out_slots[i, : len(slots)] = slots[:K]
            rem = int(prev.decode_budget_after[i])
            limits[i] = lens_next[i] + min(max(rem, 0), K)
        mwb = self._finalize(
            np.zeros(len(self.reqs), dtype=np.int32),  # tokens chained on device
            lens_next - 1,
            lens_next,
            out_slots,
            None,
            None,
        )
        mwb.decode_steps = K
        mwb.decode_limits = limits
        mwb.decode_budget_after = prev.decode_budget_after - (limits - lens_next)
        if any(r.mm_inputs is not None for r in self.reqs):
            mwb.mrope_delta = np.array(
                [r.mrope_delta for r in self.reqs], dtype=np.int32
            )
        return mwb

    # ------------------------------------------------------------------
    def _finalize(
        self, input_ids, positions, seq_lens, out_slots, extend_lens, prefix_lens
    ) -> ModelWorkerBatch:
        ps = self.allocator.page_size
        # size from allocated slots (covers multi-step decode preallocation)
        max_pages = max((len(r.kv_slots[::ps]) for r in self.reqs), default=1)
        max_pages = max(max_pages, 1)
        page_tables = np.zeros((len(self.reqs), max_pages), dtype=np.int32)
        for i, req in enumerate(self.reqs):
            pages = req.kv_slots[::ps] // ps
            page_tables[i, : len(pages)] = pages
        top_k = max((r.top_logprobs_num for r in self.reqs), default=0)
        if top_k > 0:
            top_k = 5 if top_k <= 5 else 20  # bucket to limit recompiles
        lora_ids = None
        if any(getattr(r, "lora_id", 0) for r in self.reqs):
            lora_ids = np.array(
                [getattr(r, "lora_id", 0) for r in self.reqs], dtype=np.int32
            )
        swa_pt = None
        if self.swa is not None:
            swa_pt = np.zeros(
                (len(self.reqs), self.swa.ring_pages), dtype=np.int32
            )
            for i, req in enumerate(self.reqs):
                swa_pt[i, : len(req.swa_pages)] = req.swa_pages
        mm_cross = {}
        if any(getattr(r, "mm_slot_cross", None) is not None for r in self.reqs):
            mm_cross = dict(
                mm_slots=np.array(
                    [getattr(r, "mm_slot_cross", None) or 0 for r in self.reqs],
                    dtype=np.int32,
                ),
                mm_first_pos=np.array(
                    [
                        r.mm_first_pos
                        if getattr(r, "mm_slot_cross", None)
                        else (1 << 30)
                        for r in self.reqs
                    ],
                    dtype=np.int32,
                ),
                mm_vis_len=np.array(
                    [getattr(r, "mm_vis_len", 0) or 0 for r in self.reqs],
                    dtype=np.int32,
                ),
                mm_vis_total=np.array(
                    [getattr(r, "mm_vis_total", 0) or 0 for r in self.reqs],
                    dtype=np.int32,
                ),
            )
        return ModelWorkerBatch(
            forward_mode=self.forward_mode,
            **mm_cross,
            input_ids=input_ids,
            positions=positions,
            seq_lens=seq_lens,
            out_slots=out_slots,
            page_tables=page_tables,
            extend_seq_lens=extend_lens,
            extend_prefix_lens=prefix_lens,
            sampling_info=SamplingBatchNumpy.from_reqs(self.reqs),
            rids=[r.rid for r in self.reqs],
            real_bs=len(self.reqs),
            return_logprob=any(r.return_logprob for r in self.reqs),
            top_logprobs_k=top_k,
            return_input_logprob=any(
                r.return_logprob and r.logprob_start_len >= 0 for r in self.reqs
            ),
            lora_ids=lora_ids,
            swa_page_tables=swa_pt,
            dp_ranks=np.array(
                [r.dp_rank for r in self.reqs], dtype=np.int64
            ),
        )

    # ------------------------------------------------------------------
    def decode_token_budget_ok(self, extra_steps: int = 0) -> bool:
        """Can every running request take one more decode step?"""
        need_pages = 0
        ps = self.allocator.page_size
        for req in self.reqs:
            need_pages += self.allocator.pages_needed(
                len(req.kv_slots), req.seq_len + 1 + extra_steps
            )
        if self.swa is not None:
            need_swa = 0
            nw = self.swa.ring_pages
            for req in self.reqs:
                want = min(nw, -(-(req.seq_len + 1 + extra_steps) // ps))
                need_swa += max(want - len(req.swa_pages), 0)
            if (
                self.swa.allocator.available_pages()
                + self.tree_cache.evictable_swa_size() // ps
                < need_swa
            ):
                return False
        return (
            self.allocator.available_pages() + self.tree_cache.evictable_size() // ps
            >= need_pages
        )

    def retract_decode(self) -> List[Req]:
        """Evict the newest requests back to the waiting queue on OOM
        (reference `retract_decode:1378`)."""
        # Retract requests with the most remaining work last-in-first-out:
        # sort by output length ascending -> retract shortest progress first.
        order = sorted(
            range(len(self.reqs)),
            key=lambda i: (-len(self.reqs[i].origin_input_ids), len(self.reqs[i].output_ids)),
        )
        retracted: List[Req] = []
        keep = set(range(len(self.reqs)))
        idx = 0
        while idx < len(order) and not self.decode_token_budget_ok(extra_steps=1):
            if len(keep) <= 1:
                break
            i = order[idx]
            idx += 1
            req = self.reqs[i]
            keep.discard(i)
            self._release_req_kv(req)
            req.reset_for_retract()
            retracted.append(req)
        self.reqs = [self.reqs[i] for i in sorted(keep)]
        return retracted

    def _release_req_kv(self, req: Req) -> None:
        """Free a request's exclusively-owned KV and unlock its prefix."""
        # prefix_len is page-aligned tree-owned; everything after is ours.
        own = req.kv_slots[req.prefix_len :]
        self.allocator.free_slots(own)
        if self.swa is not None and req.swa_pages:
            self.swa.allocator.free_page_ids(req.swa_pages)
            req.swa_pages = []
        if req.locked_node is not None:
            self.tree_cache.dec_lock_ref(req.locked_node)
            req.locked_node = None

    # ------------------------------------------------------------------
    def filter_batch(self) -> None:
        self.reqs = [r for r in self.reqs if not r.finished]

    def merge_batch(self, other: "ScheduleBatch") -> None:
        self.reqs.extend(other.reqs)
