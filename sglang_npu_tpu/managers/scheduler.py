"""The scheduler: continuous-batching event loop.

Behavioral counterpart of the reference's `srt/managers/scheduler.py`
(`Scheduler:187`, `event_loop_normal:753`, `recv_requests:947`,
`get_next_batch_to_run:1423`, `get_new_batch_prefill:1493`,
`update_running_batch:1646`, `run_batch:1686`, watchdog `:2089`) re-designed
for the TPU process model: ONE process per host, the scheduler runs on a
dedicated thread, and the device work it launches is a single SPMD jit
program over the mesh — no per-rank scheduler replication, no NCCL-broadcast
of batch metadata.

Responsibilities per loop iteration:
  1. drain the input queue (tokenized requests + control RPCs)
  2. admit waiting requests into a prefill batch under token budgets
     (PrefillAdder, chunked prefill, radix-aware LPM policy)
  3. otherwise run one decode step for the running batch (with retraction
     on KV OOM)
  4. hand sampled tokens to the output processor -> detokenizer queue
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
import time
from typing import Any, Dict, List, Optional

import numpy as np

from sglang_npu_tpu.managers.io_struct import (
    AbortReq,
    BatchTokenIDOut,
    FlushCacheReqInput,
    FlushCacheReqOutput,
    GetInternalStateReq,
    GetInternalStateReqOutput,
    CloseSessionReqInput,
    ContinueGenerationReqInput,
    InjectDecodeReqInput,
    OpenSessionReqInput,
    OpenSessionReqOutput,
    PauseGenerationReqInput,
    PauseGenerationReqOutput,
    ReleaseMemoryOccupationReqInput,
    SaveShardedStateReqInput,
    ResumeMemoryOccupationReqInput,
    TokenizedGenerateReqInput,
    InitWeightsUpdateGroupReqInput,
    LoadLoRAAdapterReqInput,
    UpdateWeightsFromDistributedReqInput,
    RebalanceExpertsReqInput,
    UnloadLoRAAdapterReqInput,
    UpdateWeightFromDiskReqInput,
    UpdateWeightFromDiskReqOutput,
    UpdateWeightsFromTensorReqInput,
)
from sglang_npu_tpu.managers.schedule_batch import (
    FINISH_ABORT,
    ForwardMode,
    ModelWorkerBatch,
    Req,
    ScheduleBatch,
)
from sglang_npu_tpu.managers.schedule_policy import (
    AddReqResult,
    PrefillAdder,
    SchedulePolicy,
)
from sglang_npu_tpu.mem_cache.allocator import PagedAllocator
from sglang_npu_tpu.mem_cache.radix_cache import ChunkCache, RadixCache
from sglang_npu_tpu.server_args import ServerArgs

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class SchedulerStats:
    """Gauges exported to metrics (reference `SchedulerStats:134`)."""

    num_running_reqs: int = 0
    num_waiting_reqs: int = 0
    token_usage: float = 0.0
    cache_hit_rate: float = 0.0
    gen_throughput: float = 0.0
    num_retracted_reqs: int = 0
    forward_ct: int = 0


class Scheduler:
    def __init__(
        self,
        server_args: ServerArgs,
        model_runner,
        input_queue: "queue.Queue",
        output_queue: "queue.Queue",
        tokenizer=None,
        draft_runner=None,
        eagle_runner=None,
        spmd_channel=None,
    ):
        self.server_args = server_args
        self.runner = model_runner
        # Cross-host SPMD lockstep: every replica consumes the identical
        # per-iteration input list broadcast by node 0
        # (managers/zmq_transport.SpmdStepChannel; reference analogue is
        # the per-step broadcast_pyobj, parallel_state.py:726)
        self.spmd = spmd_channel
        self.draft_runner = draft_runner
        self.eagle = eagle_runner
        if eagle_runner is not None:
            self._hidden_slot_free = list(range(eagle_runner.max_slots))
        # mllama-class cross-attention vision-KV slots (slot 0 = the
        # reserved all-zeros "no image" slot)
        if getattr(model_runner.model, "mm_cross_attention", False):
            self._mm_slot_free = list(
                range(1, model_runner.model.mm_slots_max)
            )
        self.spec_steps = max(server_args.speculative_num_steps, 1)
        self.input_queue = input_queue
        self.output_queue = output_queue
        self.tokenizer = tokenizer
        self.page_size = server_args.page_size

        # DP-attention: page-id space partitions into per-rank ranges that
        # mirror the pool's page-dim sharding over the mesh data axis
        # (model_executor/dp_attention.py)
        self.dp_attn = getattr(model_runner, "dp_attn", 0) or 0
        self.allocator = PagedAllocator(
            num_pages=model_runner.num_pages,
            page_size=self.page_size,
            num_ranks=max(self.dp_attn, 1),
        )
        # Sliding-window hybrid pool: second allocator over the window pool
        # (ops/hybrid_kv.py; reference SWATokenToKVPoolAllocator)
        self.swa = None
        if getattr(model_runner, "swa_num_pages", 0):
            from sglang_npu_tpu.managers.schedule_batch import SWAContext

            self.swa = SWAContext(
                allocator=PagedAllocator(
                    num_pages=model_runner.swa_num_pages,
                    page_size=self.page_size,
                ),
                ring_pages=model_runner.swa_ring_pages,
            )
        if self.swa is not None and not server_args.disable_radix_cache:
            from sglang_npu_tpu.mem_cache.swa_radix_cache import SWARadixCache

            if server_args.enable_hierarchical_cache:
                logger.warning(
                    "hierarchical cache is not supported for sliding-window "
                    "hybrid-pool models; using SWARadixCache"
                )
            self.tree_cache = SWARadixCache(
                self.allocator,
                self.page_size,
                swa_allocator=self.swa.allocator,
                ring_pages=self.swa.ring_pages,
                copy_swa_pages=model_runner.copy_swa_pages,
            )
        elif server_args.disable_radix_cache:
            self.tree_cache = ChunkCache(self.allocator, self.page_size)
        elif server_args.enable_hierarchical_cache:
            from sglang_npu_tpu.mem_cache.hicache_storage import make_storage
            from sglang_npu_tpu.mem_cache.hiradix_cache import HiRadixCache

            self.tree_cache = HiRadixCache(
                self.allocator,
                self.page_size,
                kv_io=model_runner,
                host_bytes_budget=int(server_args.hicache_size_gb * (1 << 30)),
                write_policy=server_args.hicache_write_policy,
                storage=make_storage(
                    server_args.hicache_storage_backend,
                    server_args.hicache_storage_path,
                ),
            )
        else:
            self.tree_cache = RadixCache(self.allocator, self.page_size)
        if server_args.enable_kv_cache_events:
            if server_args.enable_hierarchical_cache:
                # HiRadixCache tombstones device pages while the host tier
                # keeps them restorable — block-removed semantics are
                # ambiguous there; not wired yet
                logger.warning(
                    "kv cache events are not supported with the "
                    "hierarchical cache; disabling event publishing"
                )
            else:
                from sglang_npu_tpu.mem_cache.kv_events import (
                    KvEventPublisher,
                )

                self.tree_cache.events = KvEventPublisher(
                    server_args.kv_events_endpoint
                )
        self.policy = SchedulePolicy(server_args.schedule_policy, self.tree_cache)

        self.waiting_queue: List[Req] = []
        self.running_batch = ScheduleBatch.init_new(
            [], self.allocator, self.tree_cache, self.swa
        )
        self.chunked_req: Optional[Req] = None
        self.last_prefill_batch: Optional[ScheduleBatch] = None

        self.max_running_requests = server_args.max_running_requests or 2048
        self.max_batch_size = self.max_running_requests
        # Adaptive decode-token reservation (reference init_new_token_ratio):
        # start optimistic, bump toward 1.0 on each retraction.
        self.new_token_ratio = min(0.7 * server_args.schedule_conservativeness, 1.0)

        self.stats = SchedulerStats()
        self.forward_ct = 0
        self.num_generated_tokens = 0
        self.last_log_time = time.time()
        self.total_cached_tokens = 0
        self.total_prompt_tokens = 0

        self._running = True
        self.paused = False  # /pause_generation halts forwards, not intake
        self._consecutive_failures = 0
        self._rid_to_req: Dict[str, Req] = {}
        # one speculatively-dispatched decode window (mwb, DecodeHandle) —
        # see _run_decode_window / ModelRunner.decode_dispatch
        self._pending_chain = None
        self.num_chained_windows = 0
        # chunk/decode alternation (MIXED-mode equivalent): True when the
        # last dispatched batch was a prefill chunk with more chunks left
        self._last_was_chunk = False
        self.watchdog_timeout = server_args.watchdog_timeout
        self.last_heartbeat = time.time()

        # Async grammar compilation (reference grammar queue,
        # `scheduler.py:2017 move_ready_grammar_requests`).
        self.grammar_backend = None
        self.grammar_queue: List[tuple] = []  # (req, future)
        # Jump-forward (reference outlines_jump_forward / xgrammar jump
        # ahead): grammar requests whose forced continuation was appended
        # and now need ONE extend round to write its KV + sample the next
        # free token.
        self.jump_queue: List[Req] = []
        self.num_jump_forward_tokens = 0
        # speculative acceptance accounting (exported as
        # sglang:spec_accept_length; reference spec_accept_length metric)
        self.total_spec_rounds = 0
        self.total_spec_accepted = 0
        # crash-dump ring of recent request summaries (reference
        # tokenizer_manager crash dump, `--crash-dump-folder`)
        from collections import deque

        self._recent_reqs = deque(maxlen=64)
        # profiler: stop the jax trace after N forwards (reference
        # /start_profile num_steps)
        self.profile_steps_remaining: Optional[int] = None
        # by-stage capture (reference --profile-by-stage,
        # scheduler_profiler_mixin.py): separate prefill/decode traces
        self.profile_stage_state: Optional[dict] = None

        # Multi-turn sessions (reference session_controller.py)
        from sglang_npu_tpu.managers.session_controller import SessionController

        self.sessions = SessionController()

    def _get_grammar_backend(self):
        if self.grammar_backend is None:
            from sglang_npu_tpu.constrained.grammar_backend import GrammarBackend

            self.grammar_backend = GrammarBackend(
                self.tokenizer, self.runner.model_config.vocab_size
            )
        return self.grammar_backend

    # ------------------------------------------------------------------
    # Event loop
    # ------------------------------------------------------------------
    def event_loop(self):
        """`event_loop_normal` (`scheduler.py:753`)."""
        while self._running:
            self.last_heartbeat = time.time()
            try:
                self.recv_requests(block=not self._has_work())
            except Exception:
                logger.exception("recv/control handling failed")
                continue
            if not self._running:
                break
            if self.grammar_queue:
                self.move_ready_grammar_requests()
            hicache_poll = getattr(self.tree_cache, "poll", None)
            if hicache_poll is not None:
                hicache_poll()
            try:
                if self._pending_chain is not None:
                    # consume the speculatively-dispatched decode window
                    # (decode_dispatch chain) before any new device work
                    mwb, handle = self._pending_chain
                    self._pending_chain = None
                    self.last_heartbeat = time.time()
                    self._run_decode_window(mwb, handle)
                    self._consecutive_failures = 0
                    continue
                batch = self.get_next_batch_to_run()
                if batch is None:
                    if hicache_poll is not None and self.tree_cache.pending_jobs():
                        # a request is deferred on an async KV restore; nap
                        # briefly instead of spinning on the waiting queue
                        time.sleep(0.001)
                    continue
                self.last_heartbeat = time.time()
                mwb, is_prefill = batch
                if self.server_args.is_embedding:
                    embeddings = self.runner.forward_embedding(mwb)
                    self.forward_ct += 1
                    self._profile_tick()
                    self.process_embedding_result(embeddings)
                    self._consecutive_failures = 0
                    continue
                if mwb.spec and not is_prefill:
                    if self.eagle is not None:
                        self.run_eagle_round(mwb)
                    else:
                        self.run_spec_round(mwb)
                    self.forward_ct += 1
                    self._profile_tick()
                    self._consecutive_failures = 0
                    continue
                if not is_prefill:
                    self._profile_stage_begin("decode")
                    handle = self.runner.decode_dispatch(mwb)
                    self._run_decode_window(mwb, handle)
                    self._consecutive_failures = 0
                    continue
                self._profile_stage_begin("prefill")
                next_tokens, logprob_info = self.runner.forward_and_sample(mwb)
                self.forward_ct += 1
                self._profile_tick()
                self._profile_stage_end("prefill")
                if is_prefill and self.draft_runner is not None:
                    # keep the draft model's KV in lockstep (same slots)
                    self.draft_runner.forward_and_sample(mwb)
                self.process_batch_result(
                    mwb, next_tokens, is_prefill, logprob_info
                )
                self._consecutive_failures = 0
            except Exception:
                # A scheduler-step failure must not kill the serving loop.
                # First isolate the failure to the batch that ran (the
                # reference isolates failures per-request — one poisoned
                # request must not flush the whole radix cache); only after
                # repeated consecutive failures (systemic breakage, e.g. a
                # corrupted allocator) escalate to the full reset.
                logger.exception("scheduler step failed; aborting current batch")
                self._consecutive_failures = (
                    getattr(self, "_consecutive_failures", 0) + 1
                )
                if self._consecutive_failures >= 3:
                    logger.error(
                        "3 consecutive step failures; resetting all state"
                    )
                    self._abort_all_inflight("internal scheduler error")
                    self._consecutive_failures = 0
                else:
                    self._abort_current_batch("internal scheduler error")
        if (
            self.profile_stage_state is not None
            and self.profile_stage_state.get("active") is not None
        ):
            # never leave a jax trace open across shutdown
            try:
                import jax

                jax.profiler.stop_trace()
            except Exception:
                pass
            self.profile_stage_state = None
        cache_shutdown = getattr(self.tree_cache, "shutdown", None)
        if cache_shutdown is not None:
            cache_shutdown()

    def _run_decode_window(self, mwb, handle):
        """Fetch + process one dispatched decode window, speculatively
        dispatching the NEXT window first (same composition, device-chained
        input tokens) so the device never idles across the host's
        process/emit work or the dispatch/fetch link latency — the TPU
        redesign of the reference overlap scheduler
        (`tp_worker_overlap_thread.py:53`).

        Safety: rows that turn out finished in THIS window over-generate
        garbage in the speculative one (discarded at its processing);
        their KV writes land in pages that are either still owned
        (deferred shrink, see process_batch_result) or freed-then-reused
        only by programs dispatched AFTER the speculative window — device
        program order makes those writes invisible."""
        can_chain = (
            handle.chainable
            and not self.server_args.disable_window_pipelining
            # by-stage traces must not straddle windows
            and self.profile_stage_state is None
            and self.spmd is None  # lockstep replicas re-derive composition
            and self.draft_runner is None
            and self.eagle is None
            and not self.waiting_queue
            and self.chunked_req is None
            and not self.grammar_queue
            and not self.jump_queue
            and self.server_args.disaggregation_mode == "null"
            and not self.dp_attn
            and list(mwb.rids) == [r.rid for r in self.running_batch.reqs]
            and not any(r.to_abort for r in self.running_batch.reqs)
            # dormant (reasoner) grammars can activate mid-window; a chained
            # window dispatched before that is known would run unconstrained
            and all(r.grammar is None for r in self.running_batch.reqs)
            and mwb.decode_budget_after is not None
            and int(np.min(mwb.decode_budget_after)) >= 0
            and int(np.max(mwb.decode_budget_after)) > 0
        )
        if can_chain:
            try:
                mwb2 = self.running_batch.prepare_for_decode_chained(mwb)
                h2 = self.runner.decode_dispatch(mwb2, chain_from=handle)
                self._pending_chain = (mwb2, h2)
                self.num_chained_windows += 1
            except Exception:
                # allocator pressure or shape drift: fall back to the
                # unpipelined path for this window
                self._pending_chain = None
        next_tokens, logprob_info = self.runner.decode_fetch(handle)
        self.forward_ct += 1
        self._profile_tick()
        self._profile_stage_end("decode")
        self.process_batch_result(mwb, next_tokens, False, logprob_info)

    def shutdown(self):
        self._running = False
        self.input_queue.put(None)

    def _has_work(self) -> bool:
        if self.paused:
            return False  # block on the input queue until /continue
        return (
            bool(self.waiting_queue)
            or not self.running_batch.is_empty()
            or self.chunked_req is not None
            or bool(self.grammar_queue)
            or bool(self.jump_queue)
            or self._pending_chain is not None
        )

    # ------------------------------------------------------------------
    # Input handling
    # ------------------------------------------------------------------
    def recv_requests(self, block: bool):
        if self.spmd is not None:
            return self._recv_requests_spmd(block)
        try:
            item = self.input_queue.get(timeout=1.0) if block else self.input_queue.get_nowait()
        except queue.Empty:
            return
        while True:
            if item is None:
                self._running = False
                return
            try:
                self.process_input_request(item)
            except Exception as e:
                # a failing control RPC must still ANSWER its caller —
                # logging alone leaves the client blocked on its mailbox
                # for the full timeout (observed: post-OOM flush_cache
                # raising turned every later bench phase into a 600s hang)
                logger.exception(
                    "input handling failed: %s", type(item).__name__
                )
                try:
                    if isinstance(item, TokenizedGenerateReqInput):
                        stub = Req(
                            rid=item.rid,
                            origin_input_text=item.input_text,
                            origin_input_ids=list(item.input_ids),
                            sampling_params=item.sampling_params,
                        )
                        stub.finished_reason = FINISH_ABORT(
                            f"request handling failed: {e!r}"
                        )
                        self._emit_finished_stub(stub)
                    else:
                        self.output_queue.put(
                            UpdateWeightFromDiskReqOutput(
                                success=False,
                                message=(
                                    f"{type(item).__name__} failed: {e!r}"
                                ),
                            )
                        )
                except Exception:
                    logger.exception("error-response emission failed")
            try:
                item = self.input_queue.get_nowait()
            except queue.Empty:
                return

    def _drain_input_queue(self, block: bool) -> list:
        items = []
        try:
            items.append(
                self.input_queue.get(timeout=1.0)
                if block
                else self.input_queue.get_nowait()
            )
            while True:
                items.append(self.input_queue.get_nowait())
        except queue.Empty:
            pass
        return items

    def _recv_requests_spmd(self, block: bool):
        """Lockstep intake for cross-host SPMD.  Node 0 drains its local
        queue and broadcasts the list (one message per scheduler iteration
        that has work or input); workers block on that broadcast.  All
        replicas therefore admit the same requests at the same iteration
        boundary — with deterministic policy decisions, every process then
        issues identical SPMD programs in identical order."""
        if self.spmd.is_entry:
            items = self._drain_input_queue(block)
            if not items and block:
                return  # idle timeout: no broadcast, workers keep waiting
            self.spmd.broadcast(items)
        else:
            items = self.spmd.recv()
        for item in items:
            if item is None:
                if self.spmd.is_entry:
                    pass  # already broadcast as part of `items`
                self._running = False
                return
            self.process_input_request(item)

    def process_input_request(self, item):
        if isinstance(item, TokenizedGenerateReqInput):
            self.handle_generate_request(item)
        elif isinstance(item, AbortReq):
            self.abort_request(item)
        elif isinstance(item, FlushCacheReqInput):
            ok = self.flush_cache()
            self.output_queue.put(FlushCacheReqOutput(success=ok))
        elif isinstance(item, PauseGenerationReqInput):
            self.paused = True
            self.output_queue.put(
                PauseGenerationReqOutput(success=True, paused=True)
            )
        elif isinstance(item, ContinueGenerationReqInput):
            self.paused = False
            self.output_queue.put(
                PauseGenerationReqOutput(success=True, paused=False)
            )
        elif isinstance(item, GetInternalStateReq):
            self.output_queue.put(
                GetInternalStateReqOutput(internal_state=self.get_internal_state())
            )
        elif isinstance(item, UpdateWeightFromDiskReqInput):
            try:
                ok, msg = self.runner.update_weights_from_disk(
                    item.model_path, item.load_format or "auto"
                )
                if ok:
                    # cached prefix KV was computed with the old weights
                    self.flush_cache()
            except Exception as e:
                ok, msg = False, str(e)
            self.output_queue.put(
                UpdateWeightFromDiskReqOutput(success=ok, message=msg)
            )
        elif isinstance(item, RebalanceExpertsReqInput):
            try:
                ok = self.runner.rebalance_experts()
                msg = "rebalanced" if ok else "no load recorded / disabled"
            except Exception as e:
                ok, msg = False, str(e)
            self.output_queue.put(
                UpdateWeightFromDiskReqOutput(success=bool(ok), message=msg)
            )
        elif isinstance(item, UpdateWeightsFromTensorReqInput):
            try:
                ok, msg = self.runner.update_weights_from_tensor(
                    item.named_tensors
                )
                if ok:
                    # cached prefix KV was computed with the old weights
                    self.flush_cache()
            except Exception as e:
                ok, msg = False, str(e)
            self.output_queue.put(
                UpdateWeightFromDiskReqOutput(success=ok, message=msg)
            )
        elif isinstance(item, InitWeightsUpdateGroupReqInput):
            try:
                ok, msg = self.runner.init_weights_update_group(
                    item.master_address, item.master_port, item.group_name
                )
            except Exception as e:
                ok, msg = False, str(e)
            self.output_queue.put(
                UpdateWeightFromDiskReqOutput(success=ok, message=msg)
            )
        elif isinstance(item, UpdateWeightsFromDistributedReqInput):
            try:
                ok, msg = self.runner.update_weights_from_distributed(
                    item.names, item.group_name
                )
                if ok:
                    # cached prefix KV was computed with the old weights
                    self.flush_cache()
            except Exception as e:
                ok, msg = False, str(e)
            self.output_queue.put(
                UpdateWeightFromDiskReqOutput(success=ok, message=msg)
            )
        elif isinstance(item, LoadLoRAAdapterReqInput):
            try:
                ok, msg = self.runner.load_lora_adapter(
                    item.lora_name, item.lora_path
                )
                if ok:
                    # cached prefix KV was computed with the old weights
                    self.flush_cache()
            except Exception as e:
                ok, msg = False, str(e)
            self.output_queue.put(
                UpdateWeightFromDiskReqOutput(success=ok, message=msg)
            )
        elif isinstance(item, UnloadLoRAAdapterReqInput):
            try:
                ok, msg = self.runner.unload_lora_adapter(item.lora_name)
                if ok:
                    # cached prefix KV was computed with the old weights
                    self.flush_cache()
            except Exception as e:
                ok, msg = False, str(e)
            self.output_queue.put(
                UpdateWeightFromDiskReqOutput(success=ok, message=msg)
            )
        elif isinstance(item, SaveShardedStateReqInput):
            try:
                n = self.runner.save_sharded_state(item.path)
                ok, msg = True, f"saved {n} leaves to {item.path}"
            except Exception as e:
                logger.exception("sharded state save failed")
                ok, msg = False, repr(e)
            self.output_queue.put(
                UpdateWeightFromDiskReqOutput(success=ok, message=msg)
            )
        elif isinstance(item, ReleaseMemoryOccupationReqInput):
            self.flush_cache()
            self.runner.release_memory()
        elif isinstance(item, ResumeMemoryOccupationReqInput):
            self.runner.resume_memory()
        elif isinstance(item, InjectDecodeReqInput):
            try:
                self.inject_decode_req(item)
            except Exception as e:
                logger.exception("decode injection failed")
                stub = Req(
                    rid=item.rid,
                    origin_input_text=None,
                    origin_input_ids=list(item.input_ids),
                    sampling_params=item.sampling_params,
                )
                stub.finished_reason = FINISH_ABORT(f"kv transfer failed: {e}")
                self._emit_finished_stub(stub)
        elif isinstance(item, OpenSessionReqInput):
            sid = self.sessions.open(item.session_id, item.capacity_of_str_len)
            self.output_queue.put(OpenSessionReqOutput(session_id=sid, success=True))
        elif isinstance(item, CloseSessionReqInput):
            self.sessions.close(item.session_id)
        else:
            logger.warning("unknown scheduler input: %r", type(item))

    def handle_generate_request(self, t: TokenizedGenerateReqInput):
        eos_ids = set(self.runner.model_config.eos_token_ids)
        if t.session_params and t.session_params.get("id"):
            sid = t.session_params["id"]
            t.input_ids = self.sessions.prepare_input(sid, t.input_ids)
        req = Req(
            rid=t.rid,
            origin_input_text=t.input_text,
            origin_input_ids=t.input_ids,
            sampling_params=t.sampling_params,
            eos_token_ids=eos_ids,
            stream=t.stream,
            return_logprob=t.return_logprob,
            top_logprobs_num=t.top_logprobs_num,
            logprob_start_len=t.logprob_start_len,
            lora_path=t.lora_path,
        )
        req.session_id = (
            t.session_params.get("id") if t.session_params else None
        )
        req.custom_logit_processor = None
        if t.custom_logit_processor:
            from sglang_npu_tpu.sampling.custom_logit_processor import (
                intern_processor,
            )

            try:
                # interned key (name / blob:<sha>): the jit compile key and
                # the runner's resolve() handle.  Interning here (not only
                # in the tokenizer) covers multi-process DP transports.
                req.custom_logit_processor = intern_processor(
                    t.custom_logit_processor
                )
            except Exception as e:
                req.finished_reason = FINISH_ABORT(
                    f"invalid custom_logit_processor: {e}"
                )
        if t.mm_inputs is not None:
            req.set_mm_inputs(t.mm_inputs)
            if (
                getattr(self.runner.model, "mm_cross_attention", False)
                and t.mm_inputs.get("aspect_ratio_ids") is not None
            ):
                if not self._mm_slot_free:
                    req.finished_reason = FINISH_ABORT(
                        "out of cross-attention vision slots "
                        "(mm_slots_max concurrent image requests)"
                    )
                else:
                    req.mm_slot_cross = self._mm_slot_free.pop()
                    model = self.runner.model
                    am = np.asarray(t.mm_inputs["aspect_ratio_mask"])
                    pp = model.patches_per_tile
                    req.mm_vis_len = int(am.sum()) * pp
                    req.mm_vis_total = int(am.size) * pp
                    tp = req.mm_token_positions
                    req.mm_first_pos = int(tp[0]) if len(tp) else 0
        req.lora_id = (
            self.runner.lora_manager.lora_id(t.lora_path)
            if getattr(self.runner, "lora_manager", None) is not None
            else 0
        )
        req.queue_time = time.time()
        if self.dp_attn:
            from sglang_npu_tpu.model_executor.dp_attention import (
                assign_dp_rank,
            )

            req.dp_rank = assign_dp_rank(
                req.origin_input_ids, self.page_size, self.dp_attn
            )
        if len(req.origin_input_ids) == 0:
            req.finished_reason = FINISH_ABORT("empty input not allowed")
            self._emit_finished_stub(req)
            return
        max_len = self.runner.model_config.context_length
        if len(req.origin_input_ids) >= max_len:
            if self.server_args.allow_auto_truncate:
                # reference --allow-auto-truncate: keep the prompt head,
                # leave room for at least a few generated tokens
                keep = max(max_len - 16, 1)
                req.origin_input_ids = req.origin_input_ids[:keep]
                req.fill_ids = list(req.origin_input_ids)
            else:
                req.finished_reason = FINISH_ABORT(
                    f"input length {len(req.origin_input_ids)} exceeds "
                    f"context {max_len}"
                )
                self._emit_finished_stub(req)
                return
        # Clamp generation length to context.
        room = max_len - len(req.origin_input_ids) - 1
        req.sampling_params.max_new_tokens = min(
            req.sampling_params.max_new_tokens, max(room, 0)
        )
        self._rid_to_req[req.rid] = req

        sp = req.sampling_params
        if sp.regex or sp.json_schema or sp.ebnf or sp.structural_tag:
            if self.tokenizer is None:
                req.finished_reason = FINISH_ABORT(
                    "grammar-constrained decoding requires a tokenizer"
                )
                self._emit_finished_stub(req)
                return
            if sp.regex:
                kind, spec = "regex", sp.regex
            elif sp.json_schema:
                kind, spec = "json", sp.json_schema
            elif sp.ebnf:
                kind, spec = "ebnf", sp.ebnf
            else:
                kind, spec = "structural_tag", sp.structural_tag
            try:
                fut = self._get_grammar_backend().submit(kind, spec)
            except Exception as e:
                req.finished_reason = FINISH_ABORT(f"grammar compile error: {e}")
                self._emit_finished_stub(req)
                return
            self.grammar_queue.append((req, fut))
            return
        self.waiting_queue.append(req)

    def move_ready_grammar_requests(self):
        still = []
        for req, fut in self.grammar_queue:
            # SPMD lockstep: compile readiness is wall-clock dependent, so
            # every replica must admit at the same iteration — block until
            # the (deterministic) compile finishes instead of polling.
            if self.spmd is not None:
                fut.result()
            if fut.done():
                try:
                    req.grammar = fut.result()
                    if self.server_args.reasoning_parser:
                        # constrain the answer, not the <think> block
                        # (reference reasoner_grammar_backend.py)
                        from sglang_npu_tpu.constrained.reasoner_grammar import (
                            ReasonerGrammar,
                            think_end_token_id,
                        )

                        tid = think_end_token_id(self.tokenizer)
                        if tid is not None:
                            req.grammar = ReasonerGrammar(req.grammar, tid)
                    self.waiting_queue.append(req)
                except Exception as e:
                    req.finished_reason = FINISH_ABORT(
                        f"grammar compile failed: {e}"
                    )
                    self._emit_finished_stub(req)
            else:
                still.append((req, fut))
        self.grammar_queue = still

    def abort_request(self, a: AbortReq):
        if a.abort_all:
            # Waiting/grammar-queue requests never ran: emit a finish record
            # immediately (mirrors the single-rid path) so clients don't hang.
            for req in self.waiting_queue:
                req.finished_reason = FINISH_ABORT()
                self._rid_to_req.pop(req.rid, None); self._release_hidden_slot(req)
                self._emit_finished_stub(req)
            self.waiting_queue = []
            for req, _fut in self.grammar_queue:
                req.finished_reason = FINISH_ABORT()
                self._rid_to_req.pop(req.rid, None); self._release_hidden_slot(req)
                self._emit_finished_stub(req)
            self.grammar_queue = []
            # Running requests get aborted at their next check_finished.
            for req in list(self._rid_to_req.values()):
                req.to_abort = True
            return
        req = self._rid_to_req.get(a.rid)
        if req is None:
            return
        if req in self.waiting_queue:
            self.waiting_queue.remove(req)
            req.finished_reason = FINISH_ABORT()
            self._emit_finished_stub(req)
        else:
            req.to_abort = True  # picked up at next check_finished

    def _abort_current_batch(self, message: str):
        """Abort only the requests in the failed step's batch, freeing their
        exclusively-owned KV and prefix locks; the radix cache, waiting
        queue, and other in-flight requests survive (reference: per-request
        error isolation — a single poisoned request must not become a
        cluster-visible cache flush)."""
        if self._pending_chain is not None:
            # the speculative window referenced this batch; drop it (its
            # device writes only touch pages the victims own or page 0)
            self._pending_chain = None
        victims: List[Req] = []
        if self.last_prefill_batch is not None:
            victims.extend(self.last_prefill_batch.reqs)
            self.last_prefill_batch = None
        victims.extend(self.running_batch.reqs)
        if self.chunked_req is not None:
            victims.append(self.chunked_req)
            self.chunked_req = None
        helper = self.running_batch  # for _release_req_kv
        self.running_batch = ScheduleBatch.init_new(
            [], self.allocator, self.tree_cache, self.swa
        )
        seen = set()
        for req in victims:
            if id(req) in seen or req.finished:
                continue
            seen.add(id(req))
            try:
                helper._release_req_kv(req)
            except Exception:
                logger.exception("KV release during batch abort failed")
            req.finished_reason = FINISH_ABORT(message)
            self._rid_to_req.pop(req.rid, None); self._release_hidden_slot(req)
            self._emit_finished_stub(req)

    def _abort_all_inflight(self, message: str):
        self._write_crash_dump(message)
        self._pending_chain = None
        for req in list(self._rid_to_req.values()):
            req.finished_reason = FINISH_ABORT(message)
            self._emit_finished_stub(req)
        self._rid_to_req.clear()
        self.waiting_queue.clear()
        self.running_batch = ScheduleBatch.init_new(
            [], self.allocator, self.tree_cache, self.swa
        )
        self.chunked_req = None
        self.last_prefill_batch = None
        self.jump_queue = []
        # drop all KV state: requests' slots are unrecoverable mid-error
        self.tree_cache.reset()
        self.allocator.clear()
        if self.swa is not None:
            self.swa.allocator.clear()
        try:
            self.runner.flush_kv()
        except Exception:
            logger.exception("flush after error failed")

    def _cache_finished(self, req: Req) -> None:
        """Hand a finished request's KV to the tree cache; the window ring
        is adopted as a snapshot (SWARadixCache) or freed (ChunkCache)."""
        self.tree_cache.cache_finished_req(req)
        if self.swa is not None and req.swa_pages:
            self.swa.allocator.free_page_ids(req.swa_pages)
            req.swa_pages = []

    def flush_cache(self) -> bool:
        if (
            not self.running_batch.is_empty()
            or self.waiting_queue
            or self.jump_queue  # jump-forward reqs still own KV pages
            or self.chunked_req is not None
        ):
            return False
        self.tree_cache.reset()
        self.allocator.clear()
        if self.swa is not None:
            self.swa.allocator.clear()
        self.runner.flush_kv()
        if self.eagle is not None:
            self.eagle.flush()
        return True

    def get_internal_state(self) -> Dict[str, Any]:
        return {
            "num_running_reqs": len(self.running_batch.reqs),
            "num_waiting_reqs": len(self.waiting_queue),
            "available_pages": self.allocator.available_pages(),
            "evictable_tokens": self.tree_cache.evictable_size(),
            "forward_ct": self.forward_ct,
            "token_usage": self._token_usage(),
            "cache_hit_rate": (
                self.total_cached_tokens / max(self.total_prompt_tokens, 1)
            ),
            "num_jump_forward_tokens": self.num_jump_forward_tokens,
            "num_chained_windows": self.num_chained_windows,
            "spec_accept_length": (
                1.0 + self.total_spec_accepted / self.total_spec_rounds
                if self.total_spec_rounds
                else 0.0
            ),
        }

    def _token_usage(self) -> float:
        total = self.allocator.size
        free = self.allocator.available_size()
        return round(1 - free / total, 3)

    # ------------------------------------------------------------------
    # Batch selection
    # ------------------------------------------------------------------
    def get_next_batch_to_run(self):
        """Returns (ModelWorkerBatch, is_prefill) or None."""
        if self.paused:
            return None
        if self.jump_queue:
            # jump-forward extend: forced tokens already appended; write
            # their KV in one extend and sample the following free token
            reqs = [r for r in self.jump_queue if not r.finished]
            self.jump_queue = []
            if reqs:
                for r in reqs:
                    r.prefix_len = len(r.kv_slots)
                    r.extend_input_len = len(r.fill_ids) - r.prefix_len
                batch = ScheduleBatch.init_new(
                    reqs, self.allocator, self.tree_cache, self.swa
                )
                self.last_prefill_batch = batch
                mwb = batch.prepare_for_extend()
                self._attach_grammar_masks(mwb, batch.reqs)
                return mwb, True
        # MIXED-mode equivalent (reference ForwardMode.MIXED,
        # `forward_batch_info.py:68`): the reference batches decode tokens
        # INTO the chunk forward; on TPU the rectangular extend layout
        # would pad every decode row to the chunk length, so instead the
        # scheduler ALTERNATES chunk and decode-window dispatches — running
        # decodes advance between every prefill chunk instead of stalling
        # for the whole multi-chunk prompt.
        if (
            self.chunked_req is not None
            and self._last_was_chunk
            and not self.running_batch.is_empty()
            and not self.server_args.disable_mixed_chunk
        ):
            self._last_was_chunk = False
            mwb = self._build_decode_window()
            if mwb is not None:
                return mwb, False
            # no decode work after all: resume the chunk below
        prefill = self.get_new_batch_prefill()
        if prefill is not None:
            self.last_prefill_batch = prefill
            mwb = prefill.prepare_for_extend()
            self._attach_grammar_masks(mwb, prefill.reqs)
            if self.eagle is not None:
                self._attach_eagle_slots(mwb, prefill.reqs)
            self._last_was_chunk = self.chunked_req is not None
            return mwb, True
        self._last_was_chunk = False

        if self.running_batch.is_empty():
            return None
        mwb = self._build_decode_window()
        if mwb is None:
            return None
        return mwb, False

    def _build_decode_window(self):
        mwb = self.update_running_batch()
        if mwb is None:
            return None
        if mwb.decode_steps > 1:
            # fused window: grammar advances on device via FSM tables
            self._attach_grammar_fsm(mwb, self.running_batch.reqs)
        if mwb.grammar_fsm is None:
            self._attach_grammar_masks(mwb, self.running_batch.reqs)
        return mwb

    def _attach_grammar_masks(self, mwb: ModelWorkerBatch, reqs: List[Req]):
        """Fill the packed allowed-token bitmask rows for grammar requests
        (vocab mask overlapped with forward in the reference,
        `model_runner._preprocess_logits:1703`)."""
        def _active(g):
            return (
                g is not None
                and not g.finished
                and not getattr(g, "is_inactive", False)
            )

        if not any(_active(r.grammar) for r in reqs):
            return
        V = self.runner.model_config.vocab_size
        nwords = (V + 31) // 32
        mask = np.full((len(reqs), nwords), 0xFFFFFFFF, dtype=np.uint32)
        for i, r in enumerate(reqs):
            if _active(r.grammar):
                mask[i] = r.grammar.vocab_mask()
        mwb.sampling_info.vocab_mask = mask
        mwb.sampling_info.has_grammar = True

    def _attach_grammar_fsm(self, mwb: ModelWorkerBatch, reqs: List[Req]):
        """Attach stacked on-device FSM tables for a fused decode window
        (K>1): per-request grammar index + dense DFA state; non-grammar and
        finished-grammar requests ride the all-ones FIN row.  The host FSM
        stays authoritative — tokens are replayed through `accept_token`
        when the window's results are processed."""
        grams: List = []
        index: Dict[int, int] = {}
        vocab = None
        gidx = np.zeros(len(reqs), dtype=np.int32)
        gstate = np.full(len(reqs), -1, dtype=np.int32)  # -1 -> FIN row
        for i, r in enumerate(reqs):
            g = r.grammar
            if g is None or g.finished or g.device is None:
                continue
            vocab = g.vocab
            di = index.get(id(g.device))
            if di is None:
                di = index[id(g.device)] = len(grams)
                grams.append(g.device)
            gidx[i] = di
            gstate[i] = g.device_state_id()
        if not grams:
            return
        mwb.grammar_fsm = (grams, gidx, gstate, vocab)

    def get_new_batch_prefill(self) -> Optional[ScheduleBatch]:
        if not self.waiting_queue and self.chunked_req is None:
            return None
        running = len(self.running_batch.reqs)
        if running >= self.max_running_requests:
            return None

        adder = PrefillAdder(
            page_size=self.page_size,
            tree_cache=self.tree_cache,
            allocator=self.allocator,
            running_tokens=sum(
                r.sampling_params.max_new_tokens - len(r.output_ids)
                for r in self.running_batch.reqs
            ),
            max_prefill_tokens=self.server_args.max_prefill_tokens,
            chunked_prefill_size=self.server_args.chunked_prefill_size,
            max_batch_size=self.max_running_requests - running,
            new_token_ratio=self.new_token_ratio,
            swa=self.swa,
        )

        if self.chunked_req is not None:
            req = self.chunked_req
            self.chunked_req = None
            adder.add_chunked_req(req)

        temp_locked = self.policy.calc_priority(self.waiting_queue, self.page_size)
        admitted = []
        for req in self.waiting_queue:
            if self.policy.effective_policy not in ("lpm", "dfs-weight"):
                req.init_next_round_input(self.tree_cache, self.page_size)
            if getattr(req, "defer_in_batch", False):
                # in-batch prefix dedup: wait one round for the twin
                # request's shared prefix to land in the radix cache
                req.defer_in_batch = False
                continue
            res = adder.add_one_req(req)
            if req in adder.can_run_list:
                admitted.append(req)
            if res != AddReqResult.CONTINUE:
                break
        # Admitted requests now own a real lock (taken in add_one_req);
        # drop the temporary matching-time locks.
        for node in temp_locked:
            self.tree_cache.dec_lock_ref(node)
        for req in admitted:
            self.waiting_queue.remove(req)
        if adder.new_chunked_req is not None:
            self.chunked_req = adder.new_chunked_req
        if not adder.can_run_list:
            return None
        for req in adder.can_run_list:
            if req.forward_entry_time is None:
                req.forward_entry_time = time.time()
            self.total_prompt_tokens += req.extend_input_len
            self.total_cached_tokens += req.prefix_len
        return ScheduleBatch.init_new(
            adder.can_run_list, self.allocator, self.tree_cache, self.swa
        )

    def _attach_eagle_slots(self, mwb: ModelWorkerBatch, reqs: List[Req]):
        """Assign hidden-buffer slots and first-chunk flags for the EAGLE
        fused prefill (draft extend + hidden capture)."""
        for r in reqs:
            if r.hidden_slot is None:
                r.hidden_slot = (
                    self._hidden_slot_free.pop()
                    if self._hidden_slot_free
                    else None
                )
        if any(r.hidden_slot is None for r in reqs):
            return  # out of slots: prefill runs without draft extend
        if mwb.return_logprob:
            # logprob prefills take the non-eagle step path; their draft
            # state stays invalid so spec rounds skip them
            return
        mwb.hidden_slots = np.array(
            [r.hidden_slot for r in reqs], dtype=np.int32
        )
        mwb.eagle_first = np.array(
            [not r.eagle_started for r in reqs], dtype=bool
        )

    def _release_hidden_slot(self, req: Req):
        if self.eagle is not None and req.hidden_slot is not None:
            self._hidden_slot_free.append(req.hidden_slot)
            req.hidden_slot = None
        if getattr(req, "mm_slot_cross", None) is not None:
            self._mm_slot_free.append(req.mm_slot_cross)
            req.mm_slot_cross = None

    def _decode_window(self) -> int:
        """Decode steps fused per dispatch; collapse to 1 when per-token
        host work is required (logprobs, grammar) — mirrors the reference
        disabling overlap for those paths."""
        if self._spec_possible():
            return self.spec_steps + 1
        K = max(self.server_args.decode_steps, 1)
        # Grammar requests keep the fused K-step window when their FSMs
        # have on-device tables (constrained/device_fsm.py); only an
        # oversized DFA (device=None) forces the host per-token path.
        for r in self.running_batch.reqs:
            g = r.grammar
            if getattr(g, "is_inactive", False):
                continue  # reasoner wrapper still thinking: grammar-free
            if g is not None and not g.finished and g.device is None:
                return 1
        return K

    def _spec_possible(self) -> bool:
        """Speculative rounds: greedy-only, no grammar/logprob (v1)."""
        if self.draft_runner is None and self.eagle is None:
            return False
        if not self.running_batch.reqs:
            return False
        ok = all(
            r.sampling_params.is_greedy
            and r.grammar is None
            and not r.return_logprob
            and getattr(r, "lora_id", 0) == 0
            for r in self.running_batch.reqs
        )
        if self.eagle is not None:
            ok = ok and all(r.eagle_ready for r in self.running_batch.reqs)
        return ok

    def run_spec_round(self, mwb: ModelWorkerBatch):
        """One draft-then-verify round (reference
        `forward_batch_speculative_generation`, `eagle_worker.py:325` —
        here with a standalone draft model and greedy chain verify)."""
        S = mwb.decode_steps - 1
        draft_mwb = dataclasses.replace(
            mwb,
            decode_steps=S,
            decode_limits=(mwb.seq_lens + S).astype(np.int32),
            spec=False,
        )
        d_tokens, _ = self.draft_runner.forward_and_sample(draft_mwb)
        preds = self.runner.forward_verify(mwb, d_tokens)
        batch = self.running_batch
        for i, req in enumerate(batch.reqs):
            m = 0
            while m < S and int(d_tokens[i, m]) == int(preds[i, m]):
                m += 1
            new_tokens = [int(t) for t in d_tokens[i, :m]] + [int(preds[i, m])]
            for t in new_tokens:
                if req.finished:
                    break
                self._append_token(req, t)
                self.num_generated_tokens += 1
            req.spec_accepted_tokens += m
            self.total_spec_rounds += 1
            self.total_spec_accepted += int(m)
            self.allocator.shrink_req(req, len(req.fill_ids) - 1)
            if req.finished:
                self._cache_finished(req)
        self._emit_outputs(batch.reqs)
        batch.filter_batch()
        self._maybe_log()

    def run_eagle_round(self, mwb: ModelWorkerBatch):
        """One EAGLE draft->tree-verify->commit round (reference
        `eagle_worker.forward_batch_speculative_generation:325`): the
        chain-with-siblings tree is drafted and verified in one fused
        dispatch; the host walks the tree greedily and a second dispatch
        commits accepted rows + corrects the draft KV."""
        batch = self.running_batch
        S, K = self.eagle.steps, self.eagle.topk
        cand, par, preds, residuals = self.eagle.draft_verify(mwb)
        B = mwb.real_bs
        fed = np.concatenate(
            [mwb.input_ids[:, None], cand.reshape(B, S * K)], axis=1
        ).astype(np.int32)
        C = S + 1
        gather_idx = np.zeros((B, C), np.int32)
        parent_idx = np.zeros((B, C), np.int32)
        commit_lens = np.ones((B,), np.int32)
        last_node = np.zeros((B,), np.int32)
        new_tokens: List[List[int]] = []
        from sglang_npu_tpu.model_executor.eagle_runner import (
            tree_accept_walk,
        )

        for i in range(B):
            # greedy tree walk (reference verify_tree_greedy); the chain
            # topology reports all parents as rank 0, which recovers the
            # old "sibling acceptance ends the round" behavior.
            accepted, cur = tree_accept_walk(cand[i], par[i], preds[i], S, K)
            for c, (_tok, node) in enumerate(accepted):
                gather_idx[i, c + 1] = node
                parent_idx[i, c + 1] = gather_idx[i, c]
            commit_lens[i] = 1 + len(accepted)
            last_node[i] = cur
            bonus = int(preds[i, cur])
            new_tokens.append([t for t, _ in accepted] + [bonus])

        self.eagle.commit(
            mwb, residuals, fed, gather_idx, parent_idx, last_node,
            commit_lens,
        )

        for i, req in enumerate(batch.reqs):
            for t in new_tokens[i]:
                if req.finished:
                    break
                self._append_token(req, t)
                self.num_generated_tokens += 1
            req.spec_accepted_tokens += commit_lens[i] - 1
            self.total_spec_rounds += 1
            self.total_spec_accepted += int(commit_lens[i]) - 1
            self.allocator.shrink_req(req, len(req.fill_ids) - 1)
            if req.finished:
                self._cache_finished(req)
        self._emit_outputs(batch.reqs)
        batch.filter_batch()
        self._maybe_log()

    def update_running_batch(self) -> Optional[ModelWorkerBatch]:
        batch = self.running_batch
        batch.filter_batch()
        if batch.is_empty():
            return None
        if not batch.decode_token_budget_ok(extra_steps=self._decode_window() - 1):
            retracted = batch.retract_decode()
            self.stats.num_retracted_reqs += len(retracted)
            if retracted:
                # mirror the reference's adaptive new_token_ratio bump
                self.new_token_ratio = min(self.new_token_ratio + 0.1, 1.0)
                self.waiting_queue.extend(retracted)
                logger.info(
                    "retracted %d reqs on KV OOM (usage %.2f)",
                    len(retracted),
                    self._token_usage(),
                )
            if batch.is_empty():
                return None
        mwb = batch.prepare_for_decode(self._decode_window())
        mwb.spec = self._spec_possible()
        if mwb.spec and self.eagle is not None:
            mwb.hidden_slots = np.array(
                [r.hidden_slot for r in batch.reqs], dtype=np.int32
            )
        return mwb

    # ------------------------------------------------------------------
    # Result processing (reference scheduler_output_processor_mixin.py)
    # ------------------------------------------------------------------
    def process_batch_result(
        self,
        mwb: ModelWorkerBatch,
        next_tokens: np.ndarray,
        is_prefill: bool,
        logprob_info=None,
    ):
        if is_prefill:
            batch = self.last_prefill_batch
            self.last_prefill_batch = None
            eagle_ran = mwb.hidden_slots is not None
            new_running = []
            for i, req in enumerate(batch.reqs):
                if eagle_ran:
                    req.eagle_started = True
                    if req.is_chunked == 0:
                        req.eagle_ready = True
                # Accumulate teacher-forced input logprobs chunk by chunk
                # (reference accumulates per chunk in process_batch_result;
                # deferring to the final chunk livelocked long regions).
                if (
                    logprob_info is not None
                    and req.return_logprob
                    and logprob_info.get("input_logprobs") is not None
                    and req.logprob_start_len >= 0
                ):
                    self._attach_input_logprobs(
                        req, logprob_info["input_logprobs"][i]
                    )
                if req.is_chunked > 0:
                    # mid-chunk: publish computed KV, no token sampled
                    req.is_chunked -= 1
                    self.tree_cache.cache_unfinished_req(req)
                    continue
                if self.server_args.disaggregation_mode == "prefill":
                    # PD: hand off KV + first token, finish locally
                    # (reference `event_loop_normal_disagg_prefill`,
                    # `send_kv_chunk`)
                    self._handoff_prefill(req, int(next_tokens[i]))
                    continue
                self._append_token(req, int(next_tokens[i]))
                if logprob_info is not None and req.return_logprob:
                    self._attach_logprob(req, logprob_info, i, None)
                if req.finished:
                    self._cache_finished(req)
                elif not req.return_logprob and self._try_jump_forward(req):
                    pass  # queued for a jump extend; not in running batch
                else:
                    new_running.append(req)
            if new_running:
                self.running_batch.merge_batch(
                    ScheduleBatch.init_new(
                        new_running, self.allocator, self.tree_cache, self.swa
                    )
                )
            self._emit_outputs(batch.reqs)
        else:
            # decode window: next_tokens is [B, K]; consume per req until
            # finish, then return unused preallocated KV slots.  Rows are
            # resolved by rid: a pipelined (chained) window may carry rows
            # whose request already finished in the previous window — their
            # over-generated tokens are discarded here.
            K = mwb.decode_steps
            jumped = []
            live = {r.rid: r for r in self.running_batch.reqs}
            window_reqs = []
            for i, rid in enumerate(mwb.rids):
                req = live.get(rid)
                if req is None:
                    continue
                window_reqs.append(req)
                for k in range(K):
                    if req.finished:
                        break
                    self._append_token(req, int(next_tokens[i, k]))
                    if logprob_info is not None and req.return_logprob:
                        self._attach_logprob(req, logprob_info, i, k)
                    self.num_generated_tokens += 1
                    if getattr(req.grammar, "just_activated", False):
                        # reasoner grammar woke on </think>: drop the rest
                        # of the unconstrained window (KV reclaimed below)
                        break
                if self._pending_chain is None or req.finished:
                    # With a chained window in flight the preallocated
                    # slots are still write targets — defer the shrink to
                    # that window's own processing.  EXCEPT finished rows:
                    # they must shrink before _cache_finished (the radix
                    # insert needs slots == written tokens), and their
                    # chained-row writes only touch the freed tail region,
                    # which no later-dispatched program can have re-read.
                    self.allocator.shrink_req(req, len(req.fill_ids) - 1)
                if req.finished:
                    self._cache_finished(req)
                elif not req.return_logprob and self._try_jump_forward(req):
                    jumped.append(req)
            self._emit_outputs(window_reqs)
            if jumped:
                js = set(id(r) for r in jumped)
                self.running_batch.reqs = [
                    r for r in self.running_batch.reqs if id(r) not in js
                ]
            self.running_batch.filter_batch()
        self._maybe_log()

    def process_embedding_result(self, embeddings: np.ndarray):
        """Embedding-mode result handling (reference embedding batches
        finish at prefill; `BatchEmbeddingOut`)."""
        from sglang_npu_tpu.managers.io_struct import BatchEmbeddingOut
        from sglang_npu_tpu.managers.schedule_batch import FINISH_LENGTH

        batch = self.last_prefill_batch
        self.last_prefill_batch = None
        done, embs = [], []
        for i, req in enumerate(batch.reqs):
            if req.is_chunked > 0:
                req.is_chunked -= 1
                self.tree_cache.cache_unfinished_req(req)
                continue
            req.finished_reason = FINISH_LENGTH(0)
            self._rid_to_req.pop(req.rid, None); self._release_hidden_slot(req)
            self._cache_finished(req)
            done.append(req)
            embs.append(embeddings[i].tolist())
        if done:
            self.output_queue.put(
                BatchEmbeddingOut(
                    rids=[r.rid for r in done],
                    finished_reasons=[r.finished_reason.to_json() for r in done],
                    embeddings=embs,
                    prompt_tokens=[len(r.origin_input_ids) for r in done],
                )
            )

    def _handoff_prefill(self, req: Req, first_token: int):
        """PD prefill-side handoff (reference
        `event_loop_normal_disagg_prefill` + `send_kv_chunk`): the
        on-device row gather is dispatched on the scheduler thread (cheap
        — a fresh device array, so the source pages can be freed
        immediately), while the slow device->host fetch over the narrow
        link runs on a background thread so prefill scheduling never
        blocks on the transfer (reference streams chunks through an
        inflight queue, `disaggregation/prefill.py:568`)."""
        from sglang_npu_tpu.managers.io_struct import KvHandoffOut
        from sglang_npu_tpu.managers.schedule_batch import FINISH_LENGTH

        handle = self.runner.gather_kv_dispatch(req.kv_slots)
        fill_ids = list(req.fill_ids)
        rid = req.rid
        req.output_ids.append(first_token)
        req.fill_ids.append(first_token)
        req.finished_reason = FINISH_LENGTH(0)
        self._rid_to_req.pop(req.rid, None); self._release_hidden_slot(req)
        self._cache_finished(req)

        if self.server_args.pd_device_handoff:
            # device-path transfer: hand the gathered DEVICE array over
            # (colocated prefill/decode share the slice; the decode
            # engine reshards it HBM->HBM — no host fetch, no npz body)
            from sglang_npu_tpu.disaggregation import DeviceKV

            self.output_queue.put(
                KvHandoffOut(
                    rid=rid,
                    fill_ids=fill_ids,
                    first_token=first_token,
                    kv_data=DeviceKV(handle[0], handle[1]),
                )
            )
            return

        def fetch_and_emit():
            try:
                kv_data = self.runner.gather_kv_fetch(handle)
                self.output_queue.put(
                    KvHandoffOut(
                        rid=rid,
                        fill_ids=fill_ids,
                        first_token=first_token,
                        kv_data=kv_data,
                    )
                )
            except Exception as e:
                logger.exception("PD handoff fetch failed")
                self.output_queue.put(
                    KvHandoffOut(
                        rid=rid, fill_ids=fill_ids,
                        first_token=first_token, kv_data=None,
                        error=str(e),
                    )
                )

        threading.Thread(
            target=fetch_and_emit, daemon=True, name=f"pd-handoff-{rid[:8]}"
        ).start()

    def inject_decode_req(self, item):
        """Enter a transferred request directly in decode state."""
        n = len(item.input_ids)
        req = Req(
            rid=item.rid,
            origin_input_text=None,
            origin_input_ids=list(item.input_ids),
            sampling_params=item.sampling_params,
            eos_token_ids=set(self.runner.model_config.eos_token_ids),
            stream=item.stream,
        )
        self._rid_to_req[req.rid] = req
        if self.dp_attn:
            from sglang_npu_tpu.model_executor.dp_attention import (
                assign_dp_rank,
            )

            req.dp_rank = assign_dp_rank(
                item.input_ids, self.page_size, self.dp_attn
            )
        need_pages = self.allocator.pages_needed(0, n)
        if (
            self.allocator.available_pages() < need_pages
            and not self.running_batch._evict_for(need_pages, req.dp_rank)
        ):
            req.finished_reason = FINISH_ABORT("decode server out of KV memory")
            self._emit_finished_stub(req)
            return
        slots = self.allocator.alloc_extend(0, n, req.pages, req.dp_rank)
        req.kv_slots = slots
        self.runner.scatter_kv(slots, item.kv_data)
        req.output_ids = [item.first_token]
        req.fill_ids = list(item.input_ids) + [item.first_token]
        req.prefix_len = 0
        self.running_batch.merge_batch(
            ScheduleBatch.init_new([req], self.allocator, self.tree_cache, self.swa)
        )

    def _attach_input_logprobs(self, req: Req, row: np.ndarray):
        """Teacher-forced prompt logprobs for the extend region (reference
        input_token_logprobs; position j's entry is log p(fill[j]|fill[:j])).
        Called once per prefill chunk; the cursor both dedups overlap from
        page-aligned chunk prefixes and advances so the next chunk's prefix
        cap moves forward."""
        if req.input_token_logprobs is None:
            req.input_token_logprobs = []
        prefix = req.prefix_len
        ext = req.extend_input_len
        start = max(req.logprob_start_len, req.logprob_cursor)
        for e in range(ext - 1):
            abs_idx = prefix + e + 1
            if start <= abs_idx < len(req.fill_ids):
                req.input_token_logprobs.append(
                    [float(row[e]), int(req.fill_ids[abs_idx]), None]
                )
        req.logprob_cursor = max(req.logprob_cursor, prefix + ext)

    def _attach_logprob(self, req: Req, info, i: int, k):
        if not req.output_ids:
            return  # max_new_tokens=0: no sampled token kept
        chosen = info["chosen"][i] if k is None else info["chosen"][i, k]
        tok = req.output_ids[-1]
        req.output_token_logprobs.append([float(chosen), int(tok), None])
        if req.top_logprobs_num > 0 and info["top_vals"] is not None:
            tv = info["top_vals"][i] if k is None else info["top_vals"][i, k]
            ti = info["top_ids"][i] if k is None else info["top_ids"][i, k]
            n = req.top_logprobs_num
            req.output_top_logprobs.append(
                [[float(v), int(t), None] for v, t in zip(tv[:n], ti[:n])]
            )

    def _try_jump_forward(self, req: Req) -> bool:
        """Jump-forward decoding (reference `outlines_jump_forward.py`,
        xgrammar jump-ahead): when the grammar forces a unique byte
        continuation, retokenize it, validate every token through the
        grammar (rolls back on any retokenization mismatch), append the
        tokens, and queue the request for a KV-writing extend round —
        replacing len(tokens) sequential decode steps with one extend."""
        if self.server_args.disable_jump_forward or self.tokenizer is None:
            return False
        g = req.grammar
        if g is None or g.finished or g.error:
            return False
        forced = getattr(g, "forced_continuation", lambda: b"")()
        if len(forced) < 2:
            return False
        try:
            text = forced.decode("utf-8")
        except UnicodeDecodeError:
            return False  # forced path split a multi-byte char; skip
        remaining = req.sampling_params.max_new_tokens - len(req.output_ids)
        try:
            toks = self.tokenizer.encode(text, add_special_tokens=False)
        except TypeError:
            toks = self.tokenizer.encode(text)
        toks = toks[: max(remaining - 1, 0)]
        if len(toks) < 2:
            return False
        accepted = 0
        ok = True
        for t in toks:
            if not g.accept_token(t):
                accepted += 1  # failed accept still pushed a state
                ok = False
                break
            accepted += 1
            if g.finished:
                ok = False  # keep the finish transition on the normal path
                break
        if not ok:
            g.rollback(accepted)
            return False
        for t in toks:
            req.output_ids.append(t)
            req.fill_ids.append(t)
        self.num_jump_forward_tokens += len(toks)
        self.jump_queue.append(req)
        return True

    def _append_token(self, req: Req, token: int):
        if req.sampling_params.max_new_tokens == 0:
            # degenerate request: prefill only, drop the sampled token
            from sglang_npu_tpu.managers.schedule_batch import FINISH_LENGTH

            req.finished_reason = FINISH_LENGTH(0)
            self._rid_to_req.pop(req.rid, None); self._release_hidden_slot(req)
            return
        if req.first_token_time is None:
            req.first_token_time = time.time()
        req.output_ids.append(token)
        req.fill_ids.append(token)
        if req.grammar is not None:
            req.grammar.accept_token(token)
            if req.grammar.finished and req.finished_reason is None:
                from sglang_npu_tpu.managers.schedule_batch import (
                    FINISH_MATCHED_TOKEN,
                )

                req.finished_reason = FINISH_MATCHED_TOKEN(token)
        req.check_finished(self.tokenizer)
        if req.finished:
            self._rid_to_req.pop(req.rid, None); self._release_hidden_slot(req)
            sid = getattr(req, "session_id", None)
            if sid:
                self.sessions.record_turn(
                    sid, req.origin_input_ids, req.output_ids
                )

    # ------------------------------------------------------------------
    def _profile_tick(self):
        """Per-stage profiler capture: stop the jax trace after the
        requested number of forwards (reference /start_profile num_steps,
        `model_runner.py` profiler step bounds)."""
        if self.profile_steps_remaining is None:
            return
        self.profile_steps_remaining -= 1
        if self.profile_steps_remaining <= 0:
            self.profile_steps_remaining = None
            try:
                import jax

                jax.profiler.stop_trace()
                logger.info("profiler trace stopped (num_steps reached)")
            except Exception:
                logger.exception("profiler stop failed")

    def start_stage_profile(self, out_dir: str, num_steps: int):
        """Arm by-stage capture: the next `num_steps` prefill forwards and
        `num_steps` decode windows each get their OWN jax trace under
        out_dir/prefill and out_dir/decode (reference --profile-by-stage,
        `scheduler_profiler_mixin.py`)."""
        self.profile_stage_state = {
            "dir": out_dir,
            "remaining": {"prefill": num_steps, "decode": num_steps},
            "active": None,
        }

    def _profile_stage_begin(self, stage: str):
        st = self.profile_stage_state
        if st is None:
            return
        import jax

        if st["remaining"].get(stage, 0) <= 0:
            if st["active"] == stage:
                # shouldn't happen, but never trace past the budget
                jax.profiler.stop_trace()
                st["active"] = None
            return
        if st["active"] != stage:
            if st["active"] is not None:
                jax.profiler.stop_trace()
            import os as _os

            jax.profiler.start_trace(_os.path.join(st["dir"], stage))
            st["active"] = stage

    def _profile_stage_end(self, stage: str):
        st = self.profile_stage_state
        if st is None or st["active"] != stage:
            return
        import jax

        st["remaining"][stage] -= 1
        if st["remaining"][stage] <= 0:
            jax.profiler.stop_trace()
            st["active"] = None
            if all(v <= 0 for v in st["remaining"].values()):
                self.profile_stage_state = None
                logger.info(
                    "by-stage profiler finished (traces under %s)", st["dir"]
                )

    def _record_recent(self, req: Req):
        self._recent_reqs.append({
            "rid": req.rid,
            "prompt_tokens": len(req.origin_input_ids),
            "output_tokens": len(req.output_ids),
            "finish_reason": (
                req.finished_reason.to_json() if req.finished_reason else None
            ),
            "queue_time": req.queue_time,
            "finish_time": req.finish_time,
        })

    def _write_crash_dump(self, message: str):
        """Dump recent + in-flight request summaries on an unrecoverable
        error (reference tokenizer_manager crash dump,
        `--crash-dump-folder`)."""
        folder = self.server_args.crash_dump_folder
        if not folder:
            return
        import json as _json
        import os as _os

        try:
            _os.makedirs(folder, exist_ok=True)
            path = _os.path.join(
                folder, f"crash_dump_{int(time.time())}.json"
            )
            inflight = [
                {
                    "rid": r.rid,
                    "prompt_tokens": len(r.origin_input_ids),
                    "output_tokens": len(r.output_ids),
                    "queue_time": r.queue_time,
                }
                for r in list(self._rid_to_req.values())[:128]
            ]
            with open(path, "w") as f:
                _json.dump(
                    {
                        "message": message,
                        "time": time.time(),
                        "inflight": inflight,
                        "recent_finished": list(self._recent_reqs),
                    },
                    f,
                    indent=1,
                )
            logger.error("crash dump written to %s", path)
        except Exception:
            logger.exception("crash dump failed")

    def _time_stats(self, req: Req) -> Optional[dict]:
        """Stage-latency breakdown of a finished request (reference
        `Req.time_stats` / TokenizerMetricsCollector observations)."""
        if not req.finished or req.queue_time is None:
            return None
        now = req.finish_time or time.time()
        ttft = (
            req.first_token_time - req.queue_time
            if req.first_token_time
            else None
        )
        e2e = now - req.queue_time
        n_out = len(req.output_ids)
        itl = (
            (now - req.first_token_time) / (n_out - 1)
            if req.first_token_time and n_out > 1
            else None
        )
        ts = {"e2e_latency": round(e2e, 6)}
        if ttft is not None:
            ts["ttft"] = round(ttft, 6)
        if req.forward_entry_time is not None:
            ts["queue_duration"] = round(
                req.forward_entry_time - req.queue_time, 6
            )
        if itl is not None:
            ts["itl_mean"] = round(itl, 6)
        try:
            from sglang_npu_tpu.metrics.collector import observe_request

            observe_request(
                self.server_args.served_model_name or "default",
                len(req.origin_input_ids), n_out, ttft, e2e, itl,
            )
        except Exception:
            pass
        return ts

    def _emit_outputs(self, reqs: List[Req]):
        out_reqs = []
        for req in reqs:
            if req.is_chunked > 0:
                continue
            if req.finished:
                if req.finish_time is None:
                    req.finish_time = time.time()
                self._record_recent(req)
                out_reqs.append(req)
            elif req.stream and (
                len(req.output_ids) - req.stream_sent
                >= self.server_args.stream_interval
            ):
                out_reqs.append(req)
        if not out_reqs:
            return
        out = BatchTokenIDOut(
            rids=[r.rid for r in out_reqs],
            finished_reasons=[
                r.finished_reason.to_json() if r.finished_reason else None
                for r in out_reqs
            ],
            decoded_texts=["" for _ in out_reqs],
            decode_ids=[list(r.output_ids) for r in out_reqs],
            read_offsets=[r.stream_sent for r in out_reqs],
            output_ids=[r.output_ids[r.stream_sent :] for r in out_reqs],
            skip_special_tokens=[
                r.sampling_params.skip_special_tokens for r in out_reqs
            ],
            spaces_between_special_tokens=[
                r.sampling_params.spaces_between_special_tokens for r in out_reqs
            ],
            no_stop_trim=[r.sampling_params.no_stop_trim for r in out_reqs],
            prompt_tokens=[len(r.origin_input_ids) for r in out_reqs],
            completion_tokens=[len(r.output_ids) for r in out_reqs],
            cached_tokens=[r.cached_tokens for r in out_reqs],
            spec_accepted_tokens=[r.spec_accepted_tokens for r in out_reqs],
            time_stats=[
                self._time_stats(r) if r.finished else None for r in out_reqs
            ],
            output_token_logprobs=[
                r.output_token_logprobs[r.stream_sent :]
                if r.return_logprob
                else None
                for r in out_reqs
            ],
            output_top_logprobs=[
                r.output_top_logprobs[r.stream_sent :]
                if r.return_logprob and r.top_logprobs_num > 0
                else None
                for r in out_reqs
            ],
            input_token_logprobs=[
                r.input_token_logprobs if r.finished else None for r in out_reqs
            ],
        )
        for r in out_reqs:
            r.stream_sent = len(r.output_ids)
        self.output_queue.put(out)

    def _emit_finished_stub(self, req: Req):
        """Emit a finish record for a request that never ran (abort/validation)."""
        self.output_queue.put(
            BatchTokenIDOut(
                rids=[req.rid],
                finished_reasons=[req.finished_reason.to_json()],
                decoded_texts=[""],
                decode_ids=[list(req.output_ids)],
                read_offsets=[0],
                output_ids=[list(req.output_ids)],
                skip_special_tokens=[True],
                spaces_between_special_tokens=[True],
                no_stop_trim=[False],
                prompt_tokens=[len(req.origin_input_ids)],
                completion_tokens=[len(req.output_ids)],
                cached_tokens=[req.cached_tokens],
            )
        )

    def _maybe_log(self):
        now = time.time()
        if self.forward_ct % self.server_args.decode_log_interval == 0:
            dt = now - self.last_log_time
            tput = self.num_generated_tokens / dt if dt > 0 else 0.0
            self.stats.gen_throughput = tput
            self.stats.num_running_reqs = len(self.running_batch.reqs)
            self.stats.num_waiting_reqs = len(self.waiting_queue)
            self.stats.token_usage = self._token_usage()
            logger.info(
                "step %d: running %d, waiting %d, tokens/s %.1f, kv usage %.2f",
                self.forward_ct,
                len(self.running_batch.reqs),
                len(self.waiting_queue),
                tput,
                self._token_usage(),
            )
            self.num_generated_tokens = 0
            self.last_log_time = now


def run_scheduler_thread(scheduler: Scheduler) -> threading.Thread:
    t = threading.Thread(target=scheduler.event_loop, daemon=True, name="scheduler")
    t.start()

    def watchdog():
        """Kill-switch for stuck forwards (reference watchdog thread,
        `scheduler.py:2089`): warn at the timeout, abort in-flight work only
        at 3x (first compiles of new shapes can legitimately take minutes
        on remote-compile backends)."""
        while scheduler._running:
            time.sleep(max(scheduler.watchdog_timeout / 10, 1.0))
            if not scheduler._has_work():
                continue
            stuck_for = time.time() - scheduler.last_heartbeat
            if stuck_for > 3 * scheduler.watchdog_timeout:
                logger.error(
                    "WATCHDOG: scheduler stuck for %.0fs; aborting in-flight "
                    "requests; state=%s",
                    stuck_for,
                    scheduler.get_internal_state(),
                )
                for req in list(scheduler._rid_to_req.values()):
                    req.to_abort = True
                scheduler.last_heartbeat = time.time()
            elif stuck_for > scheduler.watchdog_timeout:
                logger.warning(
                    "watchdog: no scheduler progress for %.0fs (long compile?)",
                    stuck_for,
                )

    wt = threading.Thread(target=watchdog, daemon=True, name="sched-watchdog")
    wt.start()
    return t
