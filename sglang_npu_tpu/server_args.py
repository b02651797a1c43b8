"""Server arguments: the single flag/config surface of the engine.

TPU-native analogue of the reference's `python/sglang/srt/server_args.py`
(`ServerArgs:48`, argparse builder, `prepare_server_args:2095`).  We keep the
reference's flag *names* where the concept carries over so that users can
switch with minimal friction, and add TPU-specific knobs (mesh shape, decode
bucket ladder, pallas backend toggles) in place of CUDA-specific ones.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import random
import tempfile
from typing import List, Literal, Optional

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ServerArgs:
    # ------------------------------------------------------------------
    # Model and tokenizer
    # ------------------------------------------------------------------
    model_path: str = ""
    tokenizer_path: Optional[str] = None
    tokenizer_mode: str = "auto"
    skip_tokenizer_init: bool = False
    load_format: str = "auto"  # auto | safetensors | dummy
    trust_remote_code: bool = False
    dtype: str = "auto"  # auto | bfloat16 | float32 | float16
    kv_cache_dtype: str = "auto"  # auto | bfloat16 | int8 | fp8_e4m3
    quantization: Optional[str] = None  # None | fp8 | w8a8_int8 | awq | gptq
    context_length: Optional[int] = None
    revision: Optional[str] = None
    model_impl: str = "auto"
    served_model_name: Optional[str] = None
    json_model_override_args: str = "{}"
    is_embedding: bool = False  # serve as an embedding model (pooled hidden)

    # ------------------------------------------------------------------
    # HTTP server
    # ------------------------------------------------------------------
    host: str = "127.0.0.1"
    port: int = 30000
    api_key: Optional[str] = None

    # ------------------------------------------------------------------
    # Memory and scheduling
    # ------------------------------------------------------------------
    mem_fraction_static: Optional[float] = None
    max_running_requests: Optional[int] = None
    max_total_tokens: Optional[int] = None
    max_prefill_tokens: int = 16384
    chunked_prefill_size: Optional[int] = None  # default set in __post_init__
    page_size: int = 16
    schedule_policy: str = "fcfs"  # fcfs | lpm | random | lof
    schedule_conservativeness: float = 1.0
    stream_interval: int = 1
    stream_output: bool = False
    disable_radix_cache: bool = False
    # KV cache events (reference kv_events / vllm KVEventBatch): publish
    # block stored/removed content hashes for external cache-aware routers
    enable_kv_cache_events: bool = False
    kv_events_endpoint: Optional[str] = None  # optional ZMQ PUB bind
    # hierarchical KV cache: evicted pages back up to host DRAM and restore
    # on prefix match (reference --enable-hierarchical-cache / hicache)
    enable_hierarchical_cache: bool = False
    hicache_size_gb: float = 4.0
    # write_through: back up prefixes to host the moment they enter the tree
    # (eviction is then free); write_back: back up lazily at evict time.
    hicache_write_policy: str = "write_through"
    # content-hash LRU of vision-tower embeddings (reference
    # mem_cache/multimodal_cache.py): repeated image prompts skip the ViT
    mm_embed_cache_entries: int = 32
    # Optional third tier below host DRAM (reference --hicache-storage-backend):
    # "file" spills host-budget overflow to page-hashed files so prefixes
    # survive restarts; "memory" is an in-process dict (tests).
    hicache_storage_backend: Optional[str] = None
    hicache_storage_path: str = "/tmp/sglang_tpu_hicache"
    max_queued_requests: Optional[int] = None
    retract_decode_steps: int = 20

    # ------------------------------------------------------------------
    # Execution
    # ------------------------------------------------------------------
    device: str = "auto"  # auto | tpu | cpu
    attention_backend: Optional[str] = None  # None=auto | pallas | xla
    sampling_backend: str = "jax"
    disable_overlap_schedule: bool = False
    disable_jit_buckets: bool = False
    # Decode steps fused into ONE device dispatch (on-device token feedback
    # loop). Amortizes host<->device round trips; tokens stream back to the
    # host once per window. 1 = classic per-step dispatch.
    decode_steps: int = 8
    decode_bucket_sizes: Optional[List[int]] = None
    prefill_bucket_sizes: Optional[List[int]] = None
    random_seed: Optional[int] = None
    watchdog_timeout: float = 300.0
    enable_nan_detection: bool = False
    # on unrecoverable scheduler errors, dump recent + in-flight request
    # summaries here (reference --crash-dump-folder)
    crash_dump_folder: Optional[str] = None

    # ------------------------------------------------------------------
    # Parallelism (mesh axes: data x model x expert)
    # ------------------------------------------------------------------
    tp_size: int = 1  # "model" mesh axis size
    dp_size: int = 1  # "data" mesh axis size
    # DP-attention (reference srt/layers/dp_attention.py): ONE SPMD program
    # over a (data=dp, model=tp) mesh — KV pages shard over the data axis
    # (no per-TP-rank KV duplication) with attention in a manual-'data'
    # shard_map; requests hash to a rank by first page.  Without this flag,
    # dp_size > 1 runs request-level DP (one engine replica per tp submesh).
    enable_dp_attention: bool = False
    ep_size: int = 1  # "expert" mesh axis size (MoE)
    # EPLB: expert-parallel load balancing (reference srt/eplb/)
    enable_eplb: bool = False
    # double-sparsity sparse decode (reference double_sparsity_backend.py):
    # labels = K restricted to r heavy channels; decode scores labels,
    # takes the top ds-token-num tokens, exact attention over those only
    ds_heavy_channel_num: int = 16
    ds_token_num: int = 256
    # W4A16 MXU compute precision on chip: "int8x2" decomposes each bf16
    # activation row into two int8 components (~14 mantissa bits, >= one
    # bf16 MXU pass) so the dequant matmul runs at the weight-DMA floor;
    # "bf16" keeps the convert-based kernel (the r2 design)
    # W4A16 decode compute: "bf16" = dequant + bf16 MXU (reference AWQ
    # dequant-GEMM class; fastest measured, probe10) | "int8x2" = exact
    # two-component int8-MXU decomposition (>= one-bf16-pass precision,
    # slower on v5e: the per-group scale work is VPU-bound)
    w4_mxu_precision: str = "bf16"
    # EP token dispatch (reference deepep normal mode): "replicated" runs
    # every rank over the full token set against its local experts (one
    # psum; optimal intra-host); "a2a" shards tokens over the EP axis and
    # all-to-alls assignments to expert owners (scales past one host)
    ep_dispatch: str = "replicated"
    ep_num_redundant_experts: int = 0  # extra physical slots for replicas
    eplb_rebalance_interval: int = 512  # decode steps between rebalances
    pp_size: int = 1  # pipeline stages (rarely useful on TPU; kept for parity)
    nnodes: int = 1
    node_rank: int = 0
    dist_init_addr: Optional[str] = None
    # cross-host SPMD: every host runs ONE process; processes join a
    # jax.distributed runtime and tp/pp span all hosts' chips in a single
    # global mesh (reference `parallel_state.py:1232`
    # init_distributed_environment + `:1287` initialize_model_parallel).
    # Without this flag, nnodes>1 means request-level DP over ZMQ.
    multihost_spmd: bool = False
    # CPU-mesh testing: number of virtual local devices each process
    # exposes (pairs with --xla_force_host_platform_device_count)
    spmd_local_devices: Optional[int] = None
    # dp dispatch policy (reference LoadBalanceMethod, dp controller)
    load_balance_method: str = "round_robin"

    # ------------------------------------------------------------------
    # Sampling / decoding extensions
    # ------------------------------------------------------------------
    # grammar jump-forward (reference --disable-jump-forward)
    disable_jump_forward: bool = False
    # decode window pipelining: speculatively dispatch window N+1 with
    # device-chained tokens while N is in flight (the overlap-scheduler
    # equivalent, reference tp_worker_overlap_thread.py); flag for A/B
    disable_window_pipelining: bool = False
    # chunk/decode alternation (reference ForwardMode.MIXED equivalent):
    # running decodes advance between prefill chunks instead of stalling
    # for a whole multi-chunk prompt; flag for A/B
    disable_mixed_chunk: bool = False
    # NOTE: model_impl (reference --model-impl) is declared once in the
    # model section above: auto = native TPU zoo with HF-torch fallback
    # for unlisted archs; transformers = force the fallback; tpu = native
    # only (error on unlisted archs)
    max_new_tokens_default: int = 128
    # named chat template / template JSON file (reference --chat-template,
    # conversation.py registry); None = HF jinja, then model-path match
    chat_template: Optional[str] = None
    # FIM template for /v1/completions with suffix (reference
    # --completion-template, code_completion_parser.py)
    completion_template: Optional[str] = None
    # send a warmup generate before the HTTP server binds (reference
    # srt/warmup.py; --skip-server-warmup)
    skip_server_warmup: bool = False
    grammar_backend: str = "none"  # none | fsm (built-in) | xgrammar
    # allow requests to ship custom logit processors (reference
    # --enable-custom-logit-processor; sampling/custom_logit_processor.py:
    # registered-by-name or dill blobs, applied inside the jitted chain)
    enable_custom_logit_processor: bool = False
    # w4a8 serving: repack grouped W4 weights to per-channel INT8 at load
    # so decode rides the int8 MXU with zero per-weight VPU work (Marlin-
    # style serving repack; see layers/quantization.repack_w4_to_int8 for
    # the accuracy analysis).  2x weight HBM vs packed int4 — leave off
    # when HBM capacity is the binding constraint.
    w4_repack_int8: bool = False
    reasoning_parser: Optional[str] = None
    tool_call_parser: Optional[str] = None

    # ------------------------------------------------------------------
    # Speculative decoding
    # ------------------------------------------------------------------
    speculative_algorithm: Optional[str] = None  # EAGLE | NEXTN
    speculative_draft_model_path: Optional[str] = None
    speculative_num_steps: int = 3
    speculative_eagle_topk: int = 4
    speculative_num_draft_tokens: int = 8

    # ------------------------------------------------------------------
    # LoRA
    # ------------------------------------------------------------------
    # enable the LoRA machinery — with zero initial adapters when
    # lora_paths is empty, so /load_lora_adapter can add them at runtime
    # (reference --enable-lora)
    enable_lora: bool = False
    lora_paths: Optional[List[str]] = None
    # tensor dump/compare debugging (reference --debug-tensor-dump-* +
    # `debug_utils/dumper.py`): every extend forward dumps per-layer
    # residual hiddens + logits + sampled tokens as npz under this folder;
    # decode windows dump their token streams.  Compare two runs with
    # `scripts/dump_compare.py`.
    debug_tensor_dump_output_folder: Optional[str] = None
    # device-path PD transfer (reference mooncake TransferEngine design
    # point): the prefill handoff keeps the gathered KV rows ON DEVICE
    # and the decode engine reshards them HBM->HBM — only for colocated
    # prefill/decode pairs sharing the process/slice
    pd_device_handoff: bool = False
    max_loras_per_batch: int = 4

    # ------------------------------------------------------------------
    # Observability
    # ------------------------------------------------------------------
    log_level: str = "info"
    log_requests: bool = False
    log_requests_level: int = 0
    enable_metrics: bool = False
    decode_log_interval: int = 40
    show_time_cost: bool = False

    # ------------------------------------------------------------------
    # Disaggregation (prefill/decode split serving) — reference §2.8
    # ------------------------------------------------------------------
    disaggregation_mode: str = "null"  # null | prefill | decode
    disaggregation_bootstrap_port: int = 8998

    # ------------------------------------------------------------------
    # Reference drop-in compatibility (reference `server_args.py` names):
    # real aliases map onto this engine's knobs in __post_init__; the
    # GPU-/CUDA-stack-only flags below are ACCEPTED so launch commands
    # port unchanged, and warn loudly when set (no TPU effect).
    # ------------------------------------------------------------------
    num_continuous_decode_steps: Optional[int] = None  # -> decode_steps
    enable_mixed_chunk: Optional[bool] = None  # -> not disable_mixed_chunk
    enable_double_sparsity: bool = False  # -> attention_backend
    ds_heavy_token_num: Optional[int] = None  # -> ds_token_num
    allow_auto_truncate: bool = False  # truncate over-context prompts
    dist_timeout: Optional[float] = None
    download_dir: Optional[str] = None
    log_level_http: Optional[str] = None
    # inert on TPU (warned when set):
    enable_torch_compile: bool = False
    torch_compile_max_bs: int = 32
    disable_cuda_graph: bool = False
    disable_cuda_graph_padding: bool = False
    cuda_graph_max_bs: Optional[int] = None
    cuda_graph_bs: Optional[List[int]] = None
    enable_cudagraph_gc: bool = False
    disable_custom_all_reduce: bool = False
    enable_mscclpp: bool = False
    enable_nccl_nvls: bool = False
    enable_symm_mem: bool = False
    enable_p2p_check: bool = False
    nccl_port: Optional[int] = None
    triton_attention_num_kv_splits: int = 8
    triton_attention_reduce_in_fp32: bool = False
    flashinfer_mla_disable_ragged: bool = False
    enable_flashinfer_allreduce_fusion: bool = False
    enable_flashinfer_cutlass_moe: bool = False
    enable_flashinfer_trtllm_moe: bool = False
    enable_triton_kernel_moe: bool = False
    enable_deepep_moe: bool = False
    deepep_mode: Optional[str] = None
    deepep_config: Optional[str] = None
    torchao_config: Optional[str] = None
    cpu_offload_gb: int = 0
    base_gpu_id: int = 0
    gpu_id_step: int = 1
    sm_group_num: int = 3
    enable_pdmux: bool = False
    enable_memory_saver: bool = False
    delete_ckpt_after_loading: bool = False
    weight_loader_disable_mmap: bool = False

    _INERT_TPU_FLAGS = (
        "enable_torch_compile", "disable_cuda_graph",
        "disable_cuda_graph_padding", "cuda_graph_max_bs", "cuda_graph_bs",
        "enable_cudagraph_gc", "disable_custom_all_reduce", "enable_mscclpp",
        "enable_nccl_nvls", "enable_symm_mem", "enable_p2p_check",
        "nccl_port", "triton_attention_reduce_in_fp32",
        "flashinfer_mla_disable_ragged", "enable_flashinfer_allreduce_fusion",
        "enable_flashinfer_cutlass_moe", "enable_flashinfer_trtllm_moe",
        "enable_triton_kernel_moe", "enable_deepep_moe", "deepep_mode",
        "deepep_config", "torchao_config", "enable_pdmux",
        "enable_memory_saver", "delete_ckpt_after_loading",
        "weight_loader_disable_mmap",
    )

    def __post_init__(self):
        # reference-name aliases
        if self.num_continuous_decode_steps is not None:
            self.decode_steps = self.num_continuous_decode_steps
        if self.enable_mixed_chunk is not None:
            self.disable_mixed_chunk = not self.enable_mixed_chunk
        if self.enable_double_sparsity and self.attention_backend is None:
            self.attention_backend = "double_sparse"
        if self.ds_heavy_token_num is not None:
            self.ds_token_num = self.ds_heavy_token_num
        import logging as _logging

        _log = _logging.getLogger(__name__)
        inert_set = [
            f
            for f in self._INERT_TPU_FLAGS
            if getattr(self, f) not in (False, None, 0)
            and f not in ("torch_compile_max_bs", "sm_group_num",
                          "gpu_id_step", "base_gpu_id", "cpu_offload_gb")
        ]
        if inert_set:
            _log.warning(
                "flags accepted for reference drop-in compatibility but "
                "inert on TPU: %s (graphs/compile = jit bucket ladder; "
                "allreduce = XLA ICI collectives; see PARITY.md)",
                ", ".join(inert_set),
            )
        if self.served_model_name is None:
            self.served_model_name = self.model_path
        if self.tokenizer_path is None:
            self.tokenizer_path = self.model_path
        if self.chunked_prefill_size is None:
            self.chunked_prefill_size = 4096
        if self.random_seed is None:
            # SPMD replicas must agree on the sampling seed (the rng key is
            # an input to a jointly-executed program)
            self.random_seed = 42 if self.multihost_spmd else random.randint(0, 1 << 30)
        if self.mem_fraction_static is None:
            # Reference sizes KV from free memory after weights
            # (model_runner.py:965 profile_max_num_token). Same idea here:
            # fraction of HBM reserved for weights + KV pool.
            self.mem_fraction_static = 0.85
        if self.decode_bucket_sizes is None:
            self.decode_bucket_sizes = [1, 2, 4, 8, 16, 32, 64, 128, 256]
        if self.prefill_bucket_sizes is None:
            self.prefill_bucket_sizes = [128, 256, 512, 1024, 2048, 4096, 8192]
        if self.page_size < 1:
            raise ValueError("page_size must be >= 1")
        self.check()

    # ------------------------------------------------------------------
    def check(self):
        """Validate argument combinations (reference `check_server_args`)."""
        if self.dtype not in ("auto", "bfloat16", "float32", "float16"):
            raise ValueError(f"Unsupported dtype {self.dtype}")
        if self.kv_cache_dtype not in ("auto", "bfloat16", "float32", "int8", "fp8_e4m3"):
            raise ValueError(f"Unsupported kv_cache_dtype {self.kv_cache_dtype}")
        if self.quantization not in (
            None, "", "none", "int8", "w8a16_int8", "fp8", "fp8_e4m3",
            "w4a16", "int4", "awq", "gptq", "awq_marlin", "gptq_marlin",
            "w4a8", "w8a8_int8", "compressed-tensors", "compressed_tensors",
        ):
            raise ValueError(f"Unsupported quantization {self.quantization}")
        if self.disaggregation_mode not in ("null", "prefill", "decode"):
            raise ValueError(f"Bad disaggregation_mode {self.disaggregation_mode}")
        if self.schedule_policy not in ("fcfs", "lpm", "random", "lof", "dfs-weight"):
            raise ValueError(f"Unknown schedule policy {self.schedule_policy}")
        if self.pp_size < 1:
            raise ValueError("pp_size must be >= 1")
        if self.model_impl not in ("auto", "tpu", "transformers"):
            raise ValueError(f"Unknown model_impl {self.model_impl}")
        if self.ep_dispatch not in ("replicated", "a2a"):
            raise ValueError(f"Unknown ep_dispatch {self.ep_dispatch}")
        if self.w4_mxu_precision not in ("int8x2", "bf16"):
            raise ValueError(f"Unknown w4_mxu_precision {self.w4_mxu_precision}")
        if self.multihost_spmd:
            if self.nnodes <= 1:
                raise ValueError("--multihost-spmd requires --nnodes > 1")
            if not self.dist_init_addr:
                raise ValueError("--multihost-spmd requires --dist-init-addr")
            if self.dp_size > 1 and not self.enable_dp_attention:
                raise ValueError(
                    "--multihost-spmd is incompatible with request-level DP; "
                    "use --enable-dp-attention or drop --dp-size"
                )
            if self.enable_hierarchical_cache:
                raise ValueError(
                    "--multihost-spmd requires synchronous caching (async "
                    "HiCache restores would break scheduler lockstep)"
                )
            if self.disaggregation_mode != "null":
                raise ValueError(
                    "--multihost-spmd is incompatible with PD disaggregation"
                )

    # ------------------------------------------------------------------
    @property
    def device_kind(self) -> str:
        if self.device != "auto":
            return self.device
        # Lazy to avoid importing jax at flag-parse time.
        import jax

        backend = jax.default_backend()
        return "tpu" if backend in ("tpu", "axon") else backend

    # ------------------------------------------------------------------
    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser):
        for f in dataclasses.fields(ServerArgs):
            name = "--" + f.name.replace("_", "-")
            default = f.default if f.default is not dataclasses.MISSING else None
            if f.type in ("bool", bool) or isinstance(default, bool):
                parser.add_argument(name, action="store_true", default=default)
            elif f.name in ("lora_paths", "decode_bucket_sizes", "prefill_bucket_sizes"):
                parser.add_argument(name, nargs="*", default=None)
            else:
                # Optional[int] etc: parse as str then coerce in from_cli_args.
                parser.add_argument(name, default=default)
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "ServerArgs":
        kwargs = {}
        hints = {f.name: f.type for f in dataclasses.fields(cls)}
        for f in dataclasses.fields(cls):
            if not hasattr(args, f.name):
                continue
            v = getattr(args, f.name)
            if v is None:
                continue
            hint = str(hints[f.name])
            if isinstance(v, str):
                if "int" in hint and "List" not in hint:
                    v = int(v)
                elif "float" in hint:
                    v = float(v)
                elif "bool" in hint:
                    v = v.lower() in ("1", "true", "yes")
            if isinstance(v, list) and "int" in hint:
                v = [int(x) for x in v]
            kwargs[f.name] = v
        return cls(**kwargs)

    def url(self) -> str:
        return f"http://{self.host}:{self.port}"


def prepare_server_args(argv: List[str]) -> ServerArgs:
    """Parse CLI args into ServerArgs (reference `server_args.py:2095`)."""
    parser = argparse.ArgumentParser(description="sglang_npu_tpu server")
    ServerArgs.add_cli_args(parser)
    ns = parser.parse_args(argv)
    return ServerArgs.from_cli_args(ns)


# Worker-side snapshot of scheduler-relevant args, mirrored after the
# reference's `global_server_args_dict` (`schedule_batch.py:200`).
def global_args_snapshot(args: ServerArgs) -> dict:
    return {
        "page_size": args.page_size,
        "chunked_prefill_size": args.chunked_prefill_size,
        "attention_backend": args.attention_backend,
        "kv_cache_dtype": args.kv_cache_dtype,
        "enable_nan_detection": args.enable_nan_detection,
        "speculative_algorithm": args.speculative_algorithm,
    }


@dataclasses.dataclass
class PortArgs:
    """In-process queue / socket naming (reference `PortArgs:2112`).

    On TPU the engine is one process per host; the tokenizer<->scheduler and
    scheduler<->detokenizer channels are thread queues in-process, with ZMQ
    endpoints reserved for the multi-host control plane.
    """

    scheduler_input_ipc: str = ""
    detokenizer_ipc: str = ""
    tokenizer_ipc: str = ""
    rpc_ipc: str = ""

    @classmethod
    def init_new(cls, server_args: ServerArgs) -> "PortArgs":
        base = tempfile.mkdtemp(prefix="sgl_tpu_")
        return cls(
            scheduler_input_ipc=f"ipc://{base}/sched",
            detokenizer_ipc=f"ipc://{base}/detok",
            tokenizer_ipc=f"ipc://{base}/tok",
            rpc_ipc=f"ipc://{base}/rpc",
        )
