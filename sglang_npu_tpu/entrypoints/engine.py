"""Python-embedded engine.

Counterpart of the reference's `srt/entrypoints/engine.py` (`Engine:86`,
`_launch_subprocesses:674`): the TPU process model is one process per host,
so "subprocess launch" becomes thread launch — scheduler thread (device
dispatch), detokenizer thread, tokenizer-manager router thread — all wired
by in-process queues (multi-host: the same topology over a ZMQ control
plane).

Usage:
    import sglang_npu_tpu as sgl
    engine = sgl.Engine(model_path=..., load_format="dummy")
    out = engine.generate("hello", {"max_new_tokens": 16})
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
import time
from typing import Any, Dict, Iterator, List, Optional, Union

from sglang_npu_tpu.managers.io_struct import (
    FlushCacheReqInput,
    GenerateReqInput,
    GetInternalStateReq,
)
from sglang_npu_tpu.server_args import ServerArgs

logger = logging.getLogger(__name__)


class Engine:
    def __init__(self, server_args: Optional[ServerArgs] = None, **kwargs):
        if server_args is None:
            server_args = ServerArgs(**kwargs)
        self.server_args = server_args

        # Heavy imports deferred so `import sglang_npu_tpu` stays light.
        from sglang_npu_tpu.configs.model_config import ModelConfig
        from sglang_npu_tpu.managers.detokenizer_manager import (
            DetokenizerManager,
            run_detokenizer_thread,
        )
        from sglang_npu_tpu.managers.scheduler import (
            Scheduler,
            run_scheduler_thread,
        )
        from sglang_npu_tpu.managers.tokenizer_manager import TokenizerManager
        from sglang_npu_tpu.model_executor.model_runner import ModelRunner
        from sglang_npu_tpu.tokenizer.byte_tokenizer import get_tokenizer

        from sglang_npu_tpu.connector import is_remote_url, pull_model

        if is_remote_url(server_args.model_path):
            # remote weights (reference srt/connector/): materialize into
            # the local cache, then load as a normal directory
            server_args.model_path = pull_model(server_args.model_path)
        self.model_config = ModelConfig.from_model_path(
            server_args.model_path,
            dtype=server_args.dtype,
            context_length=server_args.context_length,
            json_override=server_args.json_model_override_args,
        )
        if server_args.skip_tokenizer_init:
            self.tokenizer = None
        else:
            self.tokenizer = get_tokenizer(
                server_args.tokenizer_path,
                server_args.tokenizer_mode,
                trust_remote_code=server_args.trust_remote_code,
            )

        self._spmd_channel = None
        if server_args.multihost_spmd and server_args.nnodes > 1:
            # Cross-host SPMD: this node runs the (single) lockstep
            # scheduler replica + the serving front; worker hosts run
            # launch_worker --multihost-spmd.  jax.distributed must come
            # up before any device use (parallel/dist.py).
            from sglang_npu_tpu.managers.zmq_transport import SpmdStepChannel
            from sglang_npu_tpu.parallel.dist import init_multihost_spmd

            init_multihost_spmd(server_args)
            self._spmd_channel = SpmdStepChannel(
                server_args.dist_init_addr,
                num_workers=server_args.nnodes - 1,
                is_entry=True,
            )
        elif server_args.nnodes > 1 and server_args.node_rank == 0:
            self._init_multihost_entry(server_args)
            return
        if server_args.dp_size > 1 and not server_args.enable_dp_attention:
            # request-level DP: one engine replica per tp submesh.  With
            # --enable-dp-attention the dp axis instead lives INSIDE one
            # SPMD program (model_executor/dp_attention.py): single
            # scheduler, KV pages sharded over the mesh data axis.
            self._init_data_parallel(server_args)
            return

        # Generic `transformers` fallback (reference srt/models/transformers.py
        # + --model-impl): an architecture with no native TPU implementation
        # still serves, via HF torch modeling code on the host CPU.
        use_fallback = server_args.model_impl == "transformers"
        if server_args.model_impl == "auto" and not use_fallback:
            from sglang_npu_tpu.models.registry import resolve_model_class

            try:
                resolve_model_class(self.model_config.architectures)
            except ValueError:
                use_fallback = True
        if use_fallback:
            from sglang_npu_tpu.model_executor.torch_fallback import (
                TorchFallbackRunner,
            )

            # per-rid HF caches can't share cross-request prefixes
            server_args.disable_radix_cache = True
            self.model_runner = TorchFallbackRunner(
                server_args, self.model_config
            )
        else:
            self.model_runner = ModelRunner(server_args, self.model_config)

        # Speculative decoding: EAGLE (hidden-state draft head + tree
        # verify) or a standalone draft model sharing the page allocator
        # (same KV slot ids in a smaller parallel pool).
        self.draft_runner = None
        self.eagle_runner = None
        if server_args.speculative_draft_model_path:
            if (server_args.speculative_algorithm or "").upper() in (
                "EAGLE", "EAGLE3", "NEXTN",
            ):
                from sglang_npu_tpu.model_executor.eagle_runner import (
                    EagleRunner,
                )

                self.eagle_runner = EagleRunner(
                    server_args, self.model_runner
                )
                self.model_runner.eagle = self.eagle_runner
            else:
                draft_cfg = ModelConfig.from_model_path(
                    server_args.speculative_draft_model_path,
                    dtype=server_args.dtype,
                )
                if draft_cfg.vocab_size != self.model_config.vocab_size:
                    raise ValueError(
                        "draft model vocab size must match target"
                    )
                self.draft_runner = ModelRunner(
                    server_args,
                    draft_cfg,
                    mesh=self.model_runner.mesh,
                    num_pages_override=self.model_runner.num_pages,
                    model_path_override=server_args.speculative_draft_model_path,
                )

        self._sched_in: queue.Queue = queue.Queue()
        self._detok_in: queue.Queue = queue.Queue()
        self._detok_out: queue.Queue = queue.Queue()

        self.scheduler = Scheduler(
            server_args,
            self.model_runner,
            input_queue=self._sched_in,
            output_queue=self._detok_in,
            tokenizer=self.tokenizer,
            draft_runner=self.draft_runner,
            eagle_runner=self.eagle_runner,
            spmd_channel=self._spmd_channel,
        )
        self.detokenizer = DetokenizerManager(
            self.tokenizer, self._detok_in, self._detok_out
        )
        self.tokenizer_manager = TokenizerManager(
            server_args, self._sched_in, self._detok_out, self.tokenizer
        )
        self._sched_thread = run_scheduler_thread(self.scheduler)
        self._detok_thread = run_detokenizer_thread(self.detokenizer)
        self.schedulers = [self.scheduler]
        self.dp_controller = None
        self._num_control_responders = 1
        self._shutdown = False
        logger.info("Engine ready (model=%s)", server_args.model_path)

    # ------------------------------------------------------------------
    def _init_multihost_entry(self, server_args: ServerArgs):
        """Entry node of a multi-host deployment: no local model — worker
        nodes (launch_worker, node_rank >= 1) run the schedulers; this
        node runs the tokenizer manager, detokenizer, and the DP
        controller over the ZMQ control plane (reference multi-node
        topology, `engine.py:674-821`)."""
        from sglang_npu_tpu.managers.data_parallel_controller import (
            DataParallelController,
            run_controller_thread,
        )
        from sglang_npu_tpu.managers.detokenizer_manager import (
            DetokenizerManager,
            run_detokenizer_thread,
        )
        from sglang_npu_tpu.managers.tokenizer_manager import TokenizerManager
        from sglang_npu_tpu.managers.zmq_transport import entry_node_queues

        assert server_args.dist_init_addr, "--dist-init-addr required"
        num_workers = server_args.nnodes - 1
        self._sched_in = queue.Queue()
        self._detok_out = queue.Queue()
        self._replica_queues, self._detok_in = entry_node_queues(
            server_args.dist_init_addr, num_workers
        )
        self.model_runner = None
        self.scheduler = None
        self.schedulers = []
        self.draft_runner = None
        self.eagle_runner = None

        self.dp_controller = DataParallelController(
            self._sched_in,
            self._replica_queues,
            schedulers=None,
            method=server_args.load_balance_method,
        )
        self._controller_thread = run_controller_thread(self.dp_controller)
        self.detokenizer = DetokenizerManager(
            self.tokenizer, self._detok_in, self._detok_out
        )
        self.tokenizer_manager = TokenizerManager(
            server_args, self._sched_in, self._detok_out, self.tokenizer
        )
        self._detok_thread = run_detokenizer_thread(self.detokenizer)
        self._sched_threads = []
        self._num_control_responders = num_workers
        self._shutdown = False
        logger.info(
            "Engine entry node ready (%d remote workers via %s)",
            num_workers, server_args.dist_init_addr,
        )

    # ------------------------------------------------------------------
    def _init_data_parallel(self, server_args: ServerArgs):
        """dp_size > 1: one Scheduler+ModelRunner replica per tp-sized
        device submesh, dispatched by a DataParallelController (reference
        `data_parallel_controller.py:65` process tree, as threads)."""
        import jax
        import numpy as np

        from sglang_npu_tpu.managers.data_parallel_controller import (
            DataParallelController,
            run_controller_thread,
        )
        from sglang_npu_tpu.managers.detokenizer_manager import (
            DetokenizerManager,
            run_detokenizer_thread,
        )
        from sglang_npu_tpu.managers.scheduler import (
            Scheduler,
            run_scheduler_thread,
        )
        from sglang_npu_tpu.managers.tokenizer_manager import TokenizerManager
        from sglang_npu_tpu.model_executor.model_runner import ModelRunner
        from sglang_npu_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        from jax.sharding import Mesh

        dp, tp = server_args.dp_size, server_args.tp_size
        devices = jax.devices()
        if dp * tp > len(devices):
            raise ValueError(
                f"dp={dp} x tp={tp} needs {dp * tp} devices, "
                f"have {len(devices)}"
            )
        self._sched_in = queue.Queue()
        self._detok_in = queue.Queue()
        self._detok_out = queue.Queue()

        self.runners = []
        self.schedulers = []
        self._replica_queues = []
        self._sched_threads = []
        for r in range(dp):
            sub = devices[r * tp : (r + 1) * tp]
            mesh = Mesh(
                np.asarray(sub).reshape(1, tp), (DATA_AXIS, MODEL_AXIS)
            )
            runner = ModelRunner(server_args, self.model_config, mesh=mesh)
            rq = queue.Queue()
            sched = Scheduler(
                server_args,
                runner,
                input_queue=rq,
                output_queue=self._detok_in,
                tokenizer=self.tokenizer,
            )
            self.runners.append(runner)
            self.schedulers.append(sched)
            self._replica_queues.append(rq)
            self._sched_threads.append(run_scheduler_thread(sched))
        self.model_runner = self.runners[0]
        self.scheduler = self.schedulers[0]
        self.draft_runner = None
        self.eagle_runner = None

        self.dp_controller = DataParallelController(
            self._sched_in,
            self._replica_queues,
            self.schedulers,
            method=server_args.load_balance_method,
        )
        self._controller_thread = run_controller_thread(self.dp_controller)

        self.detokenizer = DetokenizerManager(
            self.tokenizer, self._detok_in, self._detok_out
        )
        self.tokenizer_manager = TokenizerManager(
            server_args, self._sched_in, self._detok_out, self.tokenizer
        )
        self._detok_thread = run_detokenizer_thread(self.detokenizer)
        self._num_control_responders = dp
        self._shutdown = False
        logger.info(
            "Engine ready (model=%s, dp=%d x tp=%d)",
            server_args.model_path, dp, tp,
        )

    # ------------------------------------------------------------------
    def generate(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[Dict, List[Dict]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
        return_logprob: bool = False,
        top_logprobs_num: int = 0,
        logprob_start_len: int = -1,
        stream: bool = False,
        rid: Optional[Union[str, List[str]]] = None,
        session_params: Optional[Dict] = None,
        lora_path: Optional[Union[str, List[Optional[str]]]] = None,
        image_data=None,
        custom_logit_processor: Optional[str] = None,
    ):
        """Reference `Engine.generate` (`engine.py:138`): returns a dict for
        single prompts, a list of dicts for batches, or an iterator when
        stream=True."""
        obj = GenerateReqInput(
            text=prompt,
            input_ids=input_ids,
            sampling_params=sampling_params,
            return_logprob=return_logprob,
            top_logprobs_num=top_logprobs_num,
            logprob_start_len=logprob_start_len,
            stream=stream,
            rid=rid,
            session_params=session_params,
            lora_path=lora_path,
            image_data=image_data,
            custom_logit_processor=custom_logit_processor,
        )
        if stream:
            return self.tokenizer_manager.stream_sync(obj)
        return self.tokenizer_manager.generate_sync(obj)

    async def async_generate(self, **kwargs):
        stream = kwargs.get("stream", False)
        obj = GenerateReqInput(
            text=kwargs.get("prompt"),
            input_ids=kwargs.get("input_ids"),
            sampling_params=kwargs.get("sampling_params"),
            stream=stream,
            rid=kwargs.get("rid"),
        )
        if stream:
            return self.tokenizer_manager.generate_request(obj)
        async for chunk in self.tokenizer_manager.generate_request(obj):
            last = chunk
        return last

    # ------------------------------------------------------------------
    def flush_cache(self) -> bool:
        self._sched_in.put(FlushCacheReqInput())
        ok = True
        for _ in range(self._num_control_responders):  # one per replica
            out = self.tokenizer_manager.control_mailbox.get(timeout=600)
            ok = ok and out.success
        return ok

    def pause_generation(self) -> bool:
        """Halt forward progress; requests keep queueing (reference
        `/pause_generation`, http_server.py:744)."""
        from sglang_npu_tpu.managers.io_struct import PauseGenerationReqInput

        self._sched_in.put(PauseGenerationReqInput())
        ok = True
        for _ in range(self._num_control_responders):
            out = self.tokenizer_manager.control_mailbox.get(timeout=600)
            ok = ok and out.success
        return ok

    def continue_generation(self) -> bool:
        from sglang_npu_tpu.managers.io_struct import (
            ContinueGenerationReqInput,
        )

        self._sched_in.put(ContinueGenerationReqInput())
        ok = True
        for _ in range(self._num_control_responders):
            out = self.tokenizer_manager.control_mailbox.get(timeout=600)
            ok = ok and out.success
        return ok

    def get_internal_state(self) -> Dict[str, Any]:
        self._sched_in.put(GetInternalStateReq())
        states = [
            self.tokenizer_manager.control_mailbox.get(timeout=600).internal_state
            for _ in range(self._num_control_responders)
        ]
        if len(states) == 1:
            return states[0]
        merged = dict(states[0])
        merged["replicas"] = states
        for k in ("num_running_reqs", "num_waiting_reqs", "forward_ct"):
            merged[k] = sum(s[k] for s in states)
        return merged

    def abort_request(self, rid: str = "", abort_all: bool = False):
        self.tokenizer_manager.abort_request(rid, abort_all)

    # ------------------------------------------------------------------
    # PD disaggregation (reference `disaggregation/`): prefill-side handoff
    # and decode-side injection.
    # ------------------------------------------------------------------
    def prefill_only(self, input_ids, sampling_params=None):
        """Run prefill + first token; returns the KV handoff payload.
        Requires --disaggregation-mode prefill."""
        assert self.server_args.disaggregation_mode == "prefill"
        from sglang_npu_tpu.managers.io_struct import TokenizedGenerateReqInput
        from sglang_npu_tpu.sampling.sampling_params import SamplingParams
        import uuid as _uuid

        t = TokenizedGenerateReqInput(
            rid=_uuid.uuid4().hex,
            input_text=None,
            input_ids=list(input_ids),
            sampling_params=SamplingParams.from_dict(sampling_params),
        )
        state = self.tokenizer_manager.submit(t)
        # the host-path handoff is emitted from a background fetch thread,
        # so its message can land after the finish emission — drain until
        # it arrives
        for _ in range(8):
            chunk, _ = state.mailbox.get(timeout=600)
            if "kv_handoff" in chunk:
                break
        else:
            raise RuntimeError(f"no KV handoff emitted: {chunk}")
        handoff = chunk["kv_handoff"]
        if getattr(handoff, "error", None):
            raise RuntimeError(f"PD handoff failed: {handoff.error}")
        return handoff

    def inject_decode(self, handoff, sampling_params=None, stream=False):
        """Enter a transferred request in decode state; returns the result
        (or a stream iterator). Decode-mode servers only."""
        from sglang_npu_tpu.managers.io_struct import InjectDecodeReqInput
        from sglang_npu_tpu.managers.tokenizer_manager import ReqState
        from sglang_npu_tpu.sampling.sampling_params import SamplingParams
        import time as _time

        sp = SamplingParams.from_dict(sampling_params)
        item = InjectDecodeReqInput(
            rid=handoff.rid,
            input_ids=list(handoff.fill_ids),
            first_token=handoff.first_token,
            kv_data=handoff.kv_data,
            sampling_params=sp,
            stream=stream,
        )
        state = ReqState(created_time=_time.time())
        with self.tokenizer_manager._lock:
            self.tokenizer_manager.rid_to_state[item.rid] = state
        self._sched_in.put(item)
        if stream:
            def gen():
                while True:
                    chunk, fin = state.mailbox.get(timeout=600)
                    yield chunk
                    if fin:
                        return
            return gen()
        while True:
            chunk, fin = state.mailbox.get(timeout=600)
            if fin:
                return chunk

    def open_session(self, session_id=None, capacity_of_str_len: int = 0):
        from sglang_npu_tpu.managers.io_struct import OpenSessionReqInput

        self._sched_in.put(
            OpenSessionReqInput(
                capacity_of_str_len=capacity_of_str_len, session_id=session_id
            )
        )
        out = self.tokenizer_manager.control_mailbox.get(timeout=600)
        return out.session_id

    def close_session(self, session_id: str):
        from sglang_npu_tpu.managers.io_struct import CloseSessionReqInput

        self._sched_in.put(CloseSessionReqInput(session_id=session_id))

    def encode(self, prompt=None, input_ids=None, rid=None):
        """Compute embeddings (reference `Engine.encode`); requires
        is_embedding=True."""
        from sglang_npu_tpu.managers.io_struct import EmbeddingReqInput

        obj = EmbeddingReqInput(text=prompt, input_ids=input_ids, rid=rid)
        return self.tokenizer_manager.encode_sync(obj)

    def update_weights_from_disk(self, model_path: str, load_format: str = None):
        """Live weight reload (reference `Engine.update_weights_from_disk`)."""
        from sglang_npu_tpu.managers.io_struct import UpdateWeightFromDiskReqInput

        self._sched_in.put(
            UpdateWeightFromDiskReqInput(model_path=model_path, load_format=load_format)
        )
        out = self.tokenizer_manager.control_mailbox.get(timeout=600)
        return out.success, out.message

    def save_sharded_state(self, path: str):
        """Persist the prepared param tree as per-host shard files; a
        later Engine(model_path=path, load_format="sharded_state") (or
        auto) cold-starts without HF parsing / re-quantization
        (reference ShardedStateLoader, `model_loader/loader.py:589`)."""
        from sglang_npu_tpu.managers.io_struct import SaveShardedStateReqInput

        self._sched_in.put(SaveShardedStateReqInput(path=path))
        out = self.tokenizer_manager.control_mailbox.get(timeout=600)
        return out.success, out.message

    def score(self, query: str, items):
        """Mean per-token logprob of each item continuation after the
        query (the `/v1/score` computation as a library call; reference
        `Engine.score`)."""
        if self.tokenizer is None:
            raise ValueError("scoring requires a tokenizer")
        ids_q = self.tokenizer.encode(query)
        out = []
        for item in items:
            ids_full = self.tokenizer.encode(query + item)
            r = self.generate(
                input_ids=ids_full,
                sampling_params={"max_new_tokens": 0, "temperature": 0.0},
                return_logprob=True,
                logprob_start_len=len(ids_q),
            )
            entries = r["meta_info"].get("input_token_logprobs", [])
            out.append(sum(e[0] for e in entries) / max(len(entries), 1))
        return out

    def rebalance_experts(self):
        """Force an EPLB rebalance on the scheduler thread (reference
        eplb_manager RPC)."""
        from sglang_npu_tpu.managers.io_struct import RebalanceExpertsReqInput

        self._sched_in.put(RebalanceExpertsReqInput())
        out = self.tokenizer_manager.control_mailbox.get(timeout=600)
        return out.success, out.message

    def init_weights_update_group(
        self, master_address: str, master_port: int = 0,
        group_name: str = "default",
    ):
        """Join a trainer's weight-publish group (reference
        `Engine.init_weights_update_group` — NCCL there, ZMQ here; see
        weight_sync.py)."""
        from sglang_npu_tpu.managers.io_struct import (
            InitWeightsUpdateGroupReqInput,
        )

        self._sched_in.put(
            InitWeightsUpdateGroupReqInput(
                master_address=master_address,
                master_port=master_port,
                group_name=group_name,
            )
        )
        out = self.tokenizer_manager.control_mailbox.get(timeout=600)
        return out.success, out.message

    def update_weights_from_distributed(self, names, group_name="default"):
        """Pull named tensors from the trainer group and apply (reference
        `Engine.update_weights_from_distributed`)."""
        from sglang_npu_tpu.managers.io_struct import (
            UpdateWeightsFromDistributedReqInput,
        )

        self._sched_in.put(
            UpdateWeightsFromDistributedReqInput(
                names=list(names), group_name=group_name
            )
        )
        out = self.tokenizer_manager.control_mailbox.get(timeout=600)
        return out.success, out.message

    def load_lora_adapter(self, lora_name: str, lora_path: str):
        """Dynamic adapter load (reference `Engine.load_lora_adapter` /
        `/load_lora_adapter`, `http_server.py:625`)."""
        from sglang_npu_tpu.managers.io_struct import LoadLoRAAdapterReqInput

        self._sched_in.put(
            LoadLoRAAdapterReqInput(lora_name=lora_name, lora_path=lora_path)
        )
        out = self.tokenizer_manager.control_mailbox.get(timeout=600)
        return out.success, out.message

    def unload_lora_adapter(self, lora_name: str):
        from sglang_npu_tpu.managers.io_struct import (
            UnloadLoRAAdapterReqInput,
        )

        self._sched_in.put(UnloadLoRAAdapterReqInput(lora_name=lora_name))
        out = self.tokenizer_manager.control_mailbox.get(timeout=600)
        return out.success, out.message

    def update_weights_from_tensor(self, named_tensors):
        """In-memory weight sync: [(hf_name, np.ndarray)] (reference
        `Engine.update_weights_from_tensor`, RL trainer push)."""
        from sglang_npu_tpu.managers.io_struct import (
            UpdateWeightsFromTensorReqInput,
        )

        self._sched_in.put(
            UpdateWeightsFromTensorReqInput(named_tensors=named_tensors)
        )
        out = self.tokenizer_manager.control_mailbox.get(timeout=600)
        return out.success, out.message

    def release_memory_occupation(self):
        from sglang_npu_tpu.managers.io_struct import ReleaseMemoryOccupationReqInput

        self._sched_in.put(ReleaseMemoryOccupationReqInput())

    def resume_memory_occupation(self):
        from sglang_npu_tpu.managers.io_struct import ResumeMemoryOccupationReqInput

        self._sched_in.put(ResumeMemoryOccupationReqInput())

    def shutdown(self):
        if self._shutdown:
            return
        self._shutdown = True
        if getattr(self, "dp_controller", None) is not None:
            self.dp_controller.shutdown()
        for s in self.schedulers:
            s.shutdown()
        self.detokenizer.shutdown()
        self.tokenizer_manager.shutdown()
        for t in getattr(self, "_sched_threads", None) or [self._sched_thread]:
            t.join(timeout=5)
        self._detok_thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
