"""Per-host model execution engine.

Counterpart of the reference's `srt/model_executor/model_runner.py`
(`ModelRunner:158`, `initialize:257`, `init_memory_pool:1084`,
`init_attention_backend:1327`, `forward:1623`, `sample:1717`) and its
CUDA/NPU graph runners (`cuda_graph_runner.py:235`, `npu_graph_runner.py:52`),
re-designed for XLA:

  * Graph capture -> **jit bucket ladder**: every batch is padded to a small
    set of static shapes; `jax.jit` caches one compiled SPMD program per
    shape.  Actual lengths travel as device arrays (the clean version of the
    NPU fork's post-capture `actual_seq_lengths_kv` update hack).
  * Forward + KV write + sampling are ONE jit region with the KV pool
    donated, so decode steps are a single device dispatch with in-place KV.
  * Tensor parallelism is sharding metadata only: the same program runs on
    1 chip or a mesh (`parallel/mesh.py`).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.managers.schedule_batch import ForwardMode, ModelWorkerBatch
from sglang_npu_tpu.model_executor.forward_batch_info import (
    ForwardBatch,
    SamplingDevice,
    build_decode_forward_batch,
    build_extend_forward_batch,
    build_sampling_device,
    pad_to,
)
from sglang_npu_tpu.model_loader.loader import load_model_weights
from sglang_npu_tpu.models.registry import resolve_model_class
from sglang_npu_tpu.layers import sampler as sampler_ops
from sglang_npu_tpu.sampling.custom_logit_processor import (
    apply_custom_processors,
)
from sglang_npu_tpu.parallel.dist import fetch_np, zeros_global
from sglang_npu_tpu.parallel.mesh import build_mesh, tp_degree
from sglang_npu_tpu.server_args import ServerArgs
from sglang_npu_tpu.utils.common import cdiv, next_power_of_2, round_up


@dataclasses.dataclass
class DecodeHandle:
    """An in-flight fused decode window (see ModelRunner.decode_dispatch)."""

    out: Any  # device futures: [B, K] tokens, or logprob tuple
    last_tokens: Any  # device [bs_bucket] final sampled token (chainable)
    mwb: ModelWorkerBatch
    restore: Any
    rl: bool
    tk: int
    bs_bucket: int
    chainable: bool

logger = logging.getLogger(__name__)


class ModelRunner:
    def __init__(
        self,
        server_args: ServerArgs,
        model_config: ModelConfig,
        mesh=None,
        num_pages_override: Optional[int] = None,
        model_path_override: Optional[str] = None,
    ):
        self.server_args = server_args
        self.model_config = model_config
        self._num_pages_override = num_pages_override
        self._model_path = model_path_override or server_args.model_path
        self.page_size = server_args.page_size
        self.mesh = mesh if mesh is not None else build_mesh(
            tp_size=server_args.tp_size,
            dp_size=server_args.dp_size,
            pp_size=server_args.pp_size,
        )
        self.kv_dtype = self._resolve_kv_dtype()

        model_cls = resolve_model_class(model_config.architectures)
        self.model = model_cls(model_config)
        if server_args.ep_size > 1:
            # EP rides the model axis (reference derives EP groups from TP
            # ranks, `engine.py:723`): expert weights shard on their
            # expert dim and the MoE layer runs the shard_map EP path
            n_e = getattr(self.model, "num_experts", 0)
            if n_e <= 0:
                raise ValueError("ep_size > 1 requires a MoE model")
            if server_args.ep_size != tp_degree(self.mesh):
                raise ValueError(
                    "ep_size must equal tp_size (EP rides the model axis)"
                )
            if n_e % server_args.ep_size:
                raise ValueError(
                    f"{n_e} experts not divisible by ep={server_args.ep_size}"
                )
            self.model.ep_size = server_args.ep_size
            self.model.ep_mesh = self.mesh
            from sglang_npu_tpu.layers.moe import set_ep_dispatch

            set_ep_dispatch(server_args.ep_dispatch)
        self.eplb = None  # EplbState when --enable-eplb
        self._moe_acc = None  # device [n_moe_layers, E] routed-token counts
        if server_args.enable_eplb:
            if server_args.ep_size <= 1:
                raise ValueError("--enable-eplb requires ep_size > 1")
            red = server_args.ep_num_redundant_experts
            n_e = self.model.num_experts
            if (n_e + red) % server_args.ep_size:
                raise ValueError(
                    f"{n_e}+{red} physical expert slots not divisible by "
                    f"ep={server_args.ep_size}"
                )
            # sized into param_shapes BEFORE the loader allocates weights
            self.model.num_redundant = red
        # Pipeline parallelism: the stacked layer dim shards over the mesh
        # 'pipe' axis; the model forward runs a GPipe microbatch schedule
        # (models/llama.py _pp_backbone_forward)
        self.pp = server_args.pp_size
        if self.pp > 1:
            from sglang_npu_tpu.models.llama import LlamaForCausalLM

            if self.pp & (self.pp - 1):
                raise ValueError("pp_size must be a power of two")
            if (
                type(self.model).backbone_forward
                is not LlamaForCausalLM.backbone_forward
            ):
                raise ValueError(
                    f"{type(self.model).__name__} does not support "
                    "pipeline parallelism yet (custom backbone)"
                )
            if model_config.num_hidden_layers % self.pp:
                raise ValueError(
                    f"{model_config.num_hidden_layers} layers not divisible "
                    f"by pp={self.pp}"
                )
            if server_args.attention_backend not in (None, "xla", "pallas"):
                raise ValueError(
                    "PP supports the xla and pallas attention backends"
                )
            if server_args.speculative_draft_model_path:
                raise ValueError("PP + speculative is not supported")
            if server_args.enable_dp_attention:
                raise ValueError(
                    "PP + DP-attention is not supported yet (the GPipe "
                    "microbatch split and the data-axis batch shard both "
                    "partition the batch dim)"
                )
            if (
                server_args.attention_backend == "pallas"
                and self.kv_dtype not in (jnp.bfloat16, jnp.float32)
            ):
                raise ValueError(
                    "PP + pallas requires bf16/f32 KV (the quant scale "
                    "slabs are not pipe-sharded yet)"
                )
            if server_args.attention_backend is None:
                server_args.attention_backend = "xla"
            self.model.pp_size = self.pp
            self.model.pp_mesh = self.mesh
        # DP-attention: KV pages shard over the data axis; attention runs
        # in a manual-'data' shard_map (model_executor/dp_attention.py)
        self.dp_attn = 0
        if server_args.enable_dp_attention:
            dp = server_args.dp_size
            if dp <= 1 or dp & (dp - 1):
                raise ValueError(
                    "--enable-dp-attention needs a power-of-two dp_size > 1"
                )
            if server_args.attention_backend not in (None, "xla", "pallas"):
                raise ValueError(
                    "DP-attention supports the xla and pallas backends"
                )
            if server_args.speculative_draft_model_path:
                raise ValueError(
                    "DP-attention + speculative decoding is not supported"
                )
            if server_args.enable_hierarchical_cache:
                raise ValueError(
                    "DP-attention + hierarchical cache is not supported"
                )
            if server_args.attention_backend is None:
                server_args.attention_backend = "xla"
            self.dp_attn = dp
        self._init_attention_backend()

        # Sliding-window hybrid pool (ops/hybrid_kv.py): split layers into
        # a full pool and a bounded per-request ring pool when the model
        # mixes windowed and full attention (gemma-2/-3 class).
        self._swa_layers = None
        self.swa_num_pages = 0
        self.swa_ring_pages = 0
        sl = model_config.swa_layers
        if (
            sl is not None
            and not model_config.swa_uniform
            and getattr(self.model, "supports_hybrid_swa", False)
            and not model_config.is_mla
            and not self.dp_attn  # hybrid ring pool not dp-sharded yet
            and self.kv_dtype in (jnp.bfloat16, jnp.float32)
        ):
            from sglang_npu_tpu.ops.hybrid_kv import num_ring_pages

            self._swa_layers = sl
            self.swa_ring_pages = num_ring_pages(
                model_config.sliding_window, self.page_size
            )
            self.model.use_hybrid_pool = True

        t0 = time.time()
        from sglang_npu_tpu.model_loader.sharded_state import (
            has_sharded_state,
            load_sharded_state,
        )

        if server_args.load_format == "sharded_state" or (
            server_args.load_format == "auto"
            and has_sharded_state(self._model_path)
        ):
            # cold-start from a prepared shard dump (reference
            # ShardedStateLoader, model_loader/loader.py:589): the tree is
            # already quantized + fused, so the post-load passes below
            # no-op on it
            self.params = load_sharded_state(self._model_path, self.mesh)
        else:
            self.params = load_model_weights(
                self.model,
                self._model_path,
                server_args.load_format,
                self.mesh,
                seed=server_args.random_seed,
                quantization=server_args.quantization,
            )
        if server_args.quantization:
            from sglang_npu_tpu.layers.quantization import (
                apply_quantization,
                set_act_quant,
                set_w4_backend,
            )

            if server_args.load_format != "dummy":
                # dummy weights are emitted pre-quantized by the loader (a
                # big model's transient bf16 tree would not fit in HBM)
                self.params = apply_quantization(
                    self.params, server_args.quantization
                )
            if jax.default_backend() not in ("cpu",):
                # the Pallas dequant-matmul beats the XLA dequant einsum on
                # chip (XLA materializes the bf16 weight in HBM)
                set_w4_backend("pallas")
            # per-token int8 activations -> int8 MXU (2x bf16 rate; the
            # W4A8 kernel streams weights at ~90% HBM roofline).  W4A16
            # defaults to the int8x2 residual decomposition on chip — same
            # DMA-floor speed, >= one-bf16-pass precision.  Module flag:
            # set explicitly either way so engines created earlier in the
            # process can't leak their mode.
            qclass = server_args.quantization
            if qclass in ("compressed-tensors", "compressed_tensors"):
                # derive the serving class from the checkpoint's scheme
                # (reference compressed_tensors.py scheme dispatch)
                from sglang_npu_tpu.model_loader.quant_ingest import (
                    detect_quant_config,
                )

                ct = detect_quant_config(self._model_path) or {}
                if (
                    ct.get("ct_act_dynamic")
                    and ct.get("ct_act_bits") == 8
                    and ct.get("ct_act_type") == "int"
                    and ct.get("ct_type") == "int"
                ):
                    qclass = "w4a8" if ct.get("bits") == 4 else "w8a8_int8"
                elif ct.get("bits") == 4:
                    qclass = "w4a16"
                else:
                    qclass = (
                        "fp8" if ct.get("ct_type") == "float" else "int8"
                    )
            if qclass in ("w4a8", "w8a8_int8"):
                set_act_quant("a8")
                if qclass == "w4a8" and server_args.w4_repack_int8:
                    from sglang_npu_tpu.layers.quantization import (
                        repack_w4_to_int8,
                    )

                    self.params = repack_w4_to_int8(self.params)
            elif (
                jax.default_backend() not in ("cpu",)
                and server_args.w4_mxu_precision == "int8x2"
                and qclass
                in ("w4a16", "int4", "awq", "gptq", "awq_marlin", "gptq_marlin")
            ):
                set_act_quant("a16x2")
            else:
                set_act_quant(None)

        # Load-time projection fusion (qkv / gate+up) at tp=1: fewer,
        # wider matmul dispatches per layer.  Skipped with LoRA (adapters
        # target the unfused keys) and under PP/spec-draft sharing.
        from sglang_npu_tpu.models.llama import LlamaForCausalLM as _Llama

        if (
            tp_degree(self.mesh) == 1
            and self.pp == 1
            and not server_args.lora_paths
            and not server_args.enable_lora
            and getattr(self.model, "merge_groups", None)
            and isinstance(self.params.get("layers"), dict)
            # subclasses with custom trunks read the unmerged keys
            and type(self.model).backbone_forward is _Llama.backbone_forward
        ):
            from sglang_npu_tpu.layers.quantization import (
                merge_stacked_weights,
            )

            # each fused group is only safe when the method that consumes
            # it is the base implementation (e.g. gemma-1 overrides _mlp
            # with GeGLU -> keep gate/up unfused there)
            groups = []
            for mk, srcs in self.model.merge_groups:
                dep = (
                    _Llama._qkv_proj
                    if mk == "w_qkv"
                    else _Llama._mlp
                )
                have = (
                    type(self.model)._qkv_proj
                    if mk == "w_qkv"
                    else type(self.model)._mlp
                )
                if have is dep:
                    groups.append((mk, srcs))
            self.params = dict(self.params)
            self.params["layers"], self._merged_slices = merge_stacked_weights(
                self.params["layers"], groups
            )

        # Multi-LoRA adapters stacked into the param tree (slot 0 = none).
        self.lora_manager = None
        if server_args.lora_paths or server_args.enable_lora:
            from sglang_npu_tpu.lora.lora_manager import LoRAManager

            self.lora_manager = LoRAManager(
                server_args.lora_paths or [], self.model, self.mesh
            )
            self._refresh_lora_params()
        if server_args.enable_eplb:
            # Identity placement; redundant slots stay unread (rc=1) until
            # the first rebalance copies live weights into them.
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as PSpec

            from sglang_npu_tpu.layers.eplb import EplbState

            self.eplb = EplbState.initial(
                self.model.eplb_layer_count(),
                self.model.num_experts,
                server_args.ep_num_redundant_experts,
                server_args.ep_size,
            )
            repl = NamedSharding(self.mesh, PSpec())
            l2p0, rc0 = self.eplb.initial_tables()
            self.params = self.model.eplb_install_tables(
                self.params,
                jax.device_put(jnp.asarray(l2p0), repl),
                jax.device_put(jnp.asarray(rc0), repl),
            )
            self._moe_acc = zeros_global(
                (self.model.eplb_layer_count(), self.model.num_experts),
                jnp.int32,
                repl,
            )
            self._eplb_interval = server_args.eplb_rebalance_interval
            self._eplb_steps = 0
            self.eplb_rebalance_count = 0
        self.param_bytes = sum(
            x.nbytes for x in jax.tree_util.tree_leaves(self.params)
        )
        logger.info(
            "weights loaded: %.2f GB in %.1fs",
            self.param_bytes / 1e9,
            time.time() - t0,
        )

        self.num_pages = self._profile_num_pages()
        if self.dp_attn:
            # page-id space partitions evenly across data shards; the
            # model.attn_backend swap routes attention through the
            # manual-'data' shard_map over the rank-local page slab
            self.num_pages -= self.num_pages % self.dp_attn
            assert self.num_pages >= 2 * self.dp_attn
            self.pages_local = self.num_pages // self.dp_attn
            if self.model_config.is_mla:
                # MLA: each data shard stores only its requests' LATENTS —
                # the pool was previously replicated across all ranks,
                # which is the duplication DP-attention exists to remove
                self.model.dp_attn_mesh = self.mesh
            else:
                from sglang_npu_tpu.model_executor.dp_attention import (
                    DPAttentionBackend,
                )

                self.model.attn_backend = DPAttentionBackend(
                    self.mesh,
                    # tp>1 would need a nested model-manual shard_map
                    # around the kernel inside the data-manual region
                    use_pallas=(
                        self.server_args.attention_backend == "pallas"
                        and self.kv_dtype in (jnp.bfloat16, jnp.float32)
                        and tp_degree(self.mesh) == 1
                    ),
                )
        self.max_total_tokens = self.num_pages * self.page_size
        self.kv_pool = self._alloc_kv_pool()
        if getattr(self.model, "mm_cross_attention", False):
            # mllama-class: wrap the paged pool with per-request cached
            # vision K/V slot buffers (models/mllama.py MllamaKVPool)
            from sglang_npu_tpu.models.mllama import MllamaKVPool

            c = self.model_config
            Lc = len(self.model.cross_layers)
            S = self.model.s_vis_max
            shape = (
                Lc, self.model.mm_slots_max, S,
                c.num_key_value_heads, c.head_dim,
            )
            dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
            self.kv_pool = MllamaKVPool(
                paged=self.kv_pool,
                ck=jnp.zeros(shape, dt),
                cv=jnp.zeros(shape, dt),
            )
        pool_bytes = sum(
            x.nbytes for x in jax.tree_util.tree_leaves(self.kv_pool)
        )
        logger.info(
            "KV pool: %d pages x %d = %d tokens (%.2f GB)",
            self.num_pages,
            self.page_size,
            self.max_total_tokens,
            pool_bytes / 1e9,
        )

        # RNG for sampling
        self.rng_base = jax.random.key(server_args.random_seed)
        self.step_counter = 0
        self.eagle = None  # EagleRunner attached by the engine

        self._step_fn = self._build_step_fn()
        self._multi_fn = self._build_multi_step_fn()
        self.max_pages_per_req = cdiv(
            model_config.context_length, self.page_size
        )

        # tensor dump/compare debugging (reference `debug_utils/dumper.py`
        # + `--debug-tensor-dump-*`): see scripts/dump_compare.py
        self.dump_dir = server_args.debug_tensor_dump_output_folder
        self._dump_ct = 0
        if self.dump_dir:
            os.makedirs(self.dump_dir, exist_ok=True)
            if hasattr(self.model, "debug_forward"):
                self._dump_step_fn = self._build_dump_step_fn()
            else:
                self._dump_step_fn = None
                logger.warning(
                    "%s has no debug_forward; tensor dump records "
                    "tokens/logits metadata only", type(self.model).__name__,
                )

    # ------------------------------------------------------------------
    def _resolve_kv_dtype(self):
        kd = self.server_args.kv_cache_dtype
        if kd in ("auto", "bfloat16"):
            return jnp.bfloat16
        if kd == "float32":
            return jnp.float32
        if kd == "int8":
            return jnp.int8
        if kd == "fp8_e4m3":
            return jnp.float8_e4m3fn
        raise ValueError(kd)

    def _init_attention_backend(self):
        """Pick the attention backend (reference
        `_get_attention_backend_from_str:1384`)."""
        name = self.server_args.attention_backend
        tp = tp_degree(self.mesh)
        if self.model_config.is_mla:
            # MLA models run their own absorbed latent attention
            # (ops/mla_attention.py); the MHA kernel family does not apply.
            # On chip, the decode step uses the Pallas fused-write latent
            # kernel (ops/pallas/mla_decode_kernel.py) when the latent rank
            # tiles onto 128 lanes.
            self.attention_backend_name = "mla"
            self.model.attn_backend = None
            self.kv_head_dim = self.model_config.head_dim
            on_tpu = jax.default_backend() not in ("cpu",)
            use_pallas = (
                (name == "pallas" or (name is None and on_tpu))
                and self.model_config.kv_lora_rank % 128 == 0
                # under DP-attention the kernel runs inside the
                # data-manual shard_map; tp>1 would need nested
                # model-manual wrapping
                and not (
                    self.server_args.enable_dp_attention and tp > 1
                )
            )
            self.model.use_pallas_mla = use_pallas
            if use_pallas:
                self.attention_backend_name = "mla_pallas"
            return
        self.double_sparse = name == "double_sparse"
        if self.double_sparse:
            # sparse decode runs inside the XLA attention path via the
            # DoubleSparsePool dispatch (ops/double_sparse.py)
            if self.kv_dtype not in (jnp.bfloat16, jnp.float32):
                raise ValueError("double_sparse requires bf16/f32 KV")
            if self.server_args.enable_hierarchical_cache:
                raise ValueError("double_sparse + hicache not supported")
            from sglang_npu_tpu.ops.double_sparse import DS_TOKEN_K

            DS_TOKEN_K[0] = self.server_args.ds_token_num
            name = "xla"
        if getattr(self.model, "requires_xla_attention", False):
            # models needing non-causal mask overrides (gemma3-mm same-image
            # bidirectional attention) run the XLA path until the pallas
            # prefill kernel grows a group-mask input
            name = "xla"
        if name is None:
            on_tpu = jax.default_backend() not in ("cpu",)
            # pallas kernels need (under TP) evenly sharded KV heads
            # (shard_map over the model axis).  head_dim < 128 models run
            # with the pool lane-padded to 128 (see kv_head_dim below).
            # int8 KV runs through the kernels' PagedQuantKV path; fp8 KV
            # stays on XLA until its Mosaic casts are validated on-chip.
            name = (
                "pallas"
                if on_tpu
                and (tp == 1 or self.model_config.num_key_value_heads % tp == 0)
                and self.kv_dtype != jnp.float8_e4m3fn
                else "xla"
            )
        self.attention_backend_name = name
        # Mosaic page DMAs slice only leading pool dims, so the trailing
        # (page_size, head_dim) tile must be whole — pools for D<128 models
        # (e.g. Llama-3.2-1B, D=64) are lane-padded to 128 and the backend
        # pads q/k/v at the kernel boundary (BASELINE config 1 stays on the
        # pallas path instead of falling back to XLA).
        self.kv_head_dim = self.model_config.head_dim
        if name == "pallas" and self.kv_head_dim % 128 != 0:
            self.kv_head_dim = cdiv(self.kv_head_dim, 128) * 128
        if name == "xla":
            self.model.attn_backend = None  # model falls back to XLA path
        elif name == "pallas":
            from sglang_npu_tpu.ops.pallas.paged_attention import (
                make_pallas_attention_backend,
            )

            self.model.attn_backend = make_pallas_attention_backend(
                mesh=self.mesh if tp > 1 else None
            )
        else:
            raise ValueError(f"unknown attention backend {name}")

    # ------------------------------------------------------------------
    def _profile_num_pages(self) -> int:
        """Size the KV pool from free device memory (reference
        `profile_max_num_token:965`)."""
        if self._num_pages_override is not None:
            if self._swa_layers:
                self.swa_num_pages = self._swa_want_pages(
                    self._num_pages_override
                )
            return self._num_pages_override
        args = self.server_args
        if args.max_total_tokens is not None:
            pages = max(cdiv(args.max_total_tokens, self.page_size), 2)
            if self._swa_layers:
                self.swa_num_pages = self._swa_want_pages(pages)
            return pages
        c = self.model_config
        kv_bytes_per_page = c.kv_bytes_per_token(
            jnp.dtype(self.kv_dtype).itemsize
        ) * self.page_size
        if not c.is_mla and self.kv_head_dim != c.head_dim:
            # pool is lane-padded for the pallas kernels — size accordingly
            kv_bytes_per_page = (
                kv_bytes_per_page * self.kv_head_dim // c.head_dim
            )
        # KV heads are sharded over the model axis -> per-device bytes
        # shrink (MLA latent is replicated: no division)
        tp = tp_degree(self.mesh)
        if not c.is_mla and c.num_key_value_heads % tp == 0:
            kv_bytes_per_page //= tp
        budget = 0
        try:
            stats = jax.devices()[0].memory_stats()
            if stats:
                limit = stats["bytes_limit"]
                in_use = stats.get("bytes_in_use", 0)
                budget = int(limit * args.mem_fraction_static) - in_use
        except Exception:
            pass
        if budget <= 0 and jax.default_backend() not in ("cpu",):
            # Backend without memory_stats (e.g. tunneled PJRT): assume one
            # v5e-class chip and budget = HBM*frac - weights - workspace.
            hbm = 15.5e9
            budget = int(hbm * args.mem_fraction_static) - self.param_bytes - int(
                3.0e9
            )
        if budget <= 0:
            # CPU tests: small fixed pool.
            pages = max(cdiv(64 * 1024, self.page_size), 2)
            if self._swa_layers:
                self.swa_num_pages = self._swa_want_pages(pages)
            return pages
        from sglang_npu_tpu.parallel.dist import is_multiprocess

        if is_multiprocess():
            # pool geometry must agree across SPMD processes: host memory
            # probes can differ by a few MB, so take process 0's answer
            from jax.experimental import multihost_utils

            budget = int(
                multihost_utils.broadcast_one_to_all(np.int64(budget))
            )
        if self._swa_layers:
            # split the budget: the window pool only needs to cover the
            # concurrent-request rings; everything else goes to full layers
            L = len(self._swa_layers)
            Lf = self._swa_layers.count(False)
            full_page_bytes = max(kv_bytes_per_page * Lf // L, 1)
            swa_page_bytes = max(kv_bytes_per_page - full_page_bytes, 1)
            want = self._swa_want_pages(None)
            self.swa_num_pages = int(
                max(min(want, (budget // 2) // swa_page_bytes), 2)
            )
            budget -= self.swa_num_pages * swa_page_bytes
            return int(max(budget // full_page_bytes, 2))
        pages = budget // kv_bytes_per_page
        return int(max(pages, 2))

    def _swa_want_pages(self, full_pages: Optional[int]) -> int:
        """Window-pool sizing: one ring per concurrent request + slack."""
        mc = self.server_args.max_running_requests or 256
        want = (mc + 1) * self.swa_ring_pages
        if full_pages is not None:
            want = min(want, full_pages)
        return max(want, self.swa_ring_pages + 2)

    def _alloc_kv_pool(self) -> jax.Array:
        """Head-major paged pool [L, 2, H_kv, num_pages, ps, D], KV heads
        sharded over the model axis (reference `MHATokenToKVPool:162`).
        MLA models get the latent pool instead (`MLATokenToKVPool:708`)."""
        c = self.model_config
        if c.is_mla:
            from sglang_npu_tpu.ops.mla_attention import KPE_PAD, MLALatentPool

            # quantized latent KV: int8/fp8 ckv rows with per-row scales in
            # the kpe pad lane; kpe itself keeps bf16 (rope fidelity + the
            # free scale slot) — see ops/mla_attention.py module doc.
            # Reference: MLATokenToKVPool fp8 (`mem_cache/memory_pool.py:708`).
            if self.kv_dtype in (jnp.int8, jnp.float8_e4m3fn):
                ckv_dt, kpe_dt = self.kv_dtype, jnp.bfloat16
            else:
                ckv_dt = kpe_dt = (
                    self.kv_dtype
                    if self.kv_dtype in (jnp.bfloat16, jnp.float32)
                    else jnp.bfloat16
                )
            page_ax = "data" if self.dp_attn else None
            rep = NamedSharding(self.mesh, P(None, page_ax))
            return MLALatentPool(
                ckv=zeros_global(
                    (
                        c.num_hidden_layers,
                        self.num_pages,
                        self.page_size,
                        c.kv_lora_rank,
                    ), ckv_dt, rep),
                kpe=zeros_global((
                            c.num_hidden_layers,
                            self.num_pages,
                            self.page_size,
                            KPE_PAD,
                        ), kpe_dt, rep),
            )
        shape = (
            c.num_hidden_layers,
            2,
            c.num_key_value_heads,
            self.num_pages,
            self.page_size,
            self.kv_head_dim,  # lane-padded to 128 on the pallas path
        )
        tp = tp_degree(self.mesh)
        head_ax = "model" if c.num_key_value_heads % tp == 0 else None
        # DP-attention: pages shard over the data axis — each data shard
        # stores only its own requests' KV (dp_attention.py).  PP: the
        # layer dim shards over the pipe axis — each stage stores only its
        # layer slab's KV (llama._pp_backbone_forward).
        page_ax = "data" if self.dp_attn else None
        layer_ax = "pipe" if self.pp > 1 else None
        spec = P(layer_ax, None, head_ax, page_ax, None, None)
        sharding = NamedSharding(self.mesh, spec)
        if self._swa_layers:
            # hybrid: full-attention layers' pool + windowed layers' ring
            # pool (layer order within each pool = model order filtered)
            from sglang_npu_tpu.ops.hybrid_kv import HybridKVPool

            Lf = self._swa_layers.count(False)
            Ls = self._swa_layers.count(True)
            full_shape = (Lf,) + shape[1:]
            swa_shape = (Ls, 2, c.num_key_value_heads, self.swa_num_pages,
                         self.page_size, self.kv_head_dim)
            return HybridKVPool(
                full=zeros_global(full_shape, self.kv_dtype, sharding),
                swa=zeros_global(swa_shape, self.kv_dtype, sharding),
            )
        if self.kv_dtype in (jnp.int8, jnp.float8_e4m3fn):
            if self.attention_backend_name == "pallas":
                # per-(head, page) scale slabs read/written by the kernels
                from sglang_npu_tpu.ops.pallas.quant_kv import (
                    PagedQuantKV,
                    scale_shape,
                )

                sshape = scale_shape(
                    c.num_hidden_layers, c.num_key_value_heads, self.num_pages
                )
                sspec = (
                    P(None, None, None, "model", None)
                    if c.num_key_value_heads % tp == 0
                    else P()
                )
                return PagedQuantKV(
                    data=zeros_global(shape, self.kv_dtype, sharding),
                    scale=zeros_global(sshape, jnp.float32, NamedSharding(self.mesh, sspec),
                    ),
                )
            from sglang_npu_tpu.ops.xla_attention import QuantKVPool

            scale_spec = P(*spec[:-1]) if len(spec) else P()
            return QuantKVPool(
                data=zeros_global(shape, jnp.int8, sharding),
                scale=zeros_global(
                    shape[:-1], jnp.float32, NamedSharding(self.mesh, scale_spec)
                ),
            )
        if getattr(self, "double_sparse", False):
            from sglang_npu_tpu.ops.double_sparse import (
                DoubleSparsePool,
                default_heavy_channels,
            )

            r = self.server_args.ds_heavy_channel_num
            wk = None
            try:
                wk = self.params["layers"].get("wk")
            except Exception:
                pass
            ch = default_heavy_channels(
                wk, c.num_hidden_layers, c.num_key_value_heads,
                c.head_dim, r,
            )
            lshape = (
                c.num_hidden_layers, c.num_key_value_heads, self.num_pages,
                self.page_size, r,
            )
            repl = NamedSharding(self.mesh, P())
            return DoubleSparsePool(
                data=zeros_global(shape, self.kv_dtype, sharding),
                labels=zeros_global(lshape, self.kv_dtype, repl),
                channels=jax.device_put(jnp.asarray(ch), repl),
            )
        return zeros_global(shape, self.kv_dtype, sharding)

    # ------------------------------------------------------------------
    def _build_step_fn(self):
        model = self.model
        page_size = self.page_size

        def step(
            params, kv_pool, fb: ForwardBatch, sampling, rng, sample_mode,
            return_logprob=False, top_logprobs_k=0, has_penalties=False,
            return_input_logprob=False, has_min_new=False,
            has_logit_bias=False, custom_procs=(),
            d_params=None, eagle_state=None, hidden_slots=None,
            eagle_first=None, with_eagle=False,
        ):
            if with_eagle:
                # EAGLE prefill: target trunk -> sample as usual, PLUS the
                # draft-KV extend and hidden capture fused in this program
                # (reference `forward_draft_extend`, eagle_worker.py:813 —
                # fused here so target hiddens never cross the host link)
                d_pool, hidden_buf = eagle_state
                is_e3 = getattr(self.eagle, "is_eagle3", False)
                if is_e3:
                    x, kv_pool, aux = model.backbone_forward(
                        params, kv_pool, fb, page_size,
                        aux_after=self.eagle.aux_after,
                    )
                    aux_cat = jnp.concatenate(
                        [aux[i] for i in range(aux.shape[0])], axis=-1
                    )
                    cond = self.eagle.model.apply_fc(d_params, aux_cat)
                else:
                    x, kv_pool = model.backbone_forward(
                        params, kv_pool, fb, page_size
                    )
                    cond = x
                idx = jnp.maximum(fb.extend_seq_lens - 1, 0)
                last = jnp.take_along_axis(x, idx[:, None, None], axis=1)[
                    :, 0
                ]
                head = (
                    params["embed"]
                    if "lm_head" not in params
                    else params["lm_head"].T
                )
                logits = jnp.einsum(
                    "bd,vd->bv", last, head,
                    preferred_element_type=jnp.float32,
                )
                if has_penalties:
                    co, ca = sampler_ops.build_penalty_counts(
                        sampling, logits.shape[-1]
                    )
                    logits = sampler_ops.apply_penalties(
                        logits, sampling, co, ca
                    )
                if has_logit_bias:
                    logits = sampler_ops.apply_logit_bias(logits, sampling)
                if custom_procs:
                    logits = apply_custom_processors(
                        logits, sampling.custom_slot,
                        sampling.custom_params, custom_procs,
                    )
                if sampling.vocab_mask is not None:
                    logits = sampler_ops.apply_packed_vocab_mask(
                        logits, sampling.vocab_mask
                    )
                if has_min_new:
                    logits = sampler_ops.apply_min_new_tokens(
                        logits, sampling, 0
                    )
                if sample_mode == "greedy":
                    toks = sampler_ops.sample_greedy(logits, sampling, rng)
                elif sample_mode == "simple":
                    toks = sampler_ops.sample_simple(logits, sampling, rng)
                else:
                    toks = sampler_ops.sample_full(logits, sampling, rng)
                # draft extend: pair token at position p with hidden at
                # p-1 (chunk-boundary hidden comes from hidden_buf; zeros
                # on a request's first chunk — no earlier hidden exists)
                boundary_h = jnp.where(
                    eagle_first[:, None], 0.0, hidden_buf[hidden_slots]
                )  # [B, D]
                prev_h = jnp.concatenate(
                    [boundary_h[:, None], cond[:, :-1]], axis=1
                )
                _, d_pool = self.eagle.model.forward(
                    d_params, params["embed"], d_pool, fb, page_size, prev_h
                )
                last_cond = (
                    last
                    if not is_e3
                    else jnp.take_along_axis(
                        cond, idx[:, None, None], axis=1
                    )[:, 0]
                )
                hidden_buf = hidden_buf.at[hidden_slots].set(
                    last_cond.astype(hidden_buf.dtype), mode="drop"
                )
                return toks, kv_pool, (d_pool, hidden_buf)
            if return_input_logprob:
                # input-logprob mode (prompt scoring / echo): full-position
                # backbone, teacher-forced target logprobs + normal sampling.
                # target for position e is the next input token e+1.
                x, kv_pool = model.backbone_forward(params, kv_pool, fb, page_size)
                head = (
                    params["embed"]
                    if "lm_head" not in params
                    else params["lm_head"].T
                )
                full_logits = jnp.einsum(
                    "bed,vd->bev", x, head, preferred_element_type=jnp.float32
                )
                full_lp = jax.nn.log_softmax(full_logits, axis=-1)
                targets = jnp.concatenate(
                    [fb.input_ids[:, 1:], fb.input_ids[:, :1] * 0], axis=1
                )
                inp_lp = jnp.take_along_axis(
                    full_lp, targets[:, :, None], axis=-1
                )[:, :, 0]
                idx = jnp.maximum(fb.extend_seq_lens - 1, 0)
                logits = jnp.take_along_axis(
                    full_logits, idx[:, None, None], axis=1
                )[:, 0]
            else:
                logits, kv_pool = model(params, kv_pool, fb, page_size)
                inp_lp = None
            if sample_mode == "logits":
                return logits, kv_pool
            if has_penalties:
                co, ca = sampler_ops.build_penalty_counts(
                    sampling, logits.shape[-1]
                )
                logits = sampler_ops.apply_penalties(logits, sampling, co, ca)
            if has_logit_bias:
                logits = sampler_ops.apply_logit_bias(logits, sampling)
            if custom_procs:
                logits = apply_custom_processors(
                    logits, sampling.custom_slot,
                    sampling.custom_params, custom_procs,
                )
            if sampling.vocab_mask is not None:
                logits = sampler_ops.apply_packed_vocab_mask(
                    logits, sampling.vocab_mask
                )
            if has_min_new:
                logits = sampler_ops.apply_min_new_tokens(logits, sampling, 0)
            if sample_mode == "greedy":
                toks = sampler_ops.sample_greedy(logits, sampling, rng)
            elif sample_mode == "simple":
                toks = sampler_ops.sample_simple(logits, sampling, rng)
            else:
                toks = sampler_ops.sample_full(logits, sampling, rng)
            if not return_logprob:
                return toks, kv_pool
            logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            chosen = jnp.take_along_axis(logprobs, toks[:, None], axis=-1)[:, 0]
            if top_logprobs_k > 0:
                top_vals, top_ids = jax.lax.top_k(logprobs, top_logprobs_k)
            else:
                top_vals = top_ids = None
            return (toks, chosen, top_vals, top_ids, inp_lp), kv_pool

        return jax.jit(
            step,
            donate_argnums=(1, 13),  # kv_pool, eagle_state
            static_argnames=(
                "sample_mode",
                "return_logprob",
                "top_logprobs_k",
                "has_penalties",
                "return_input_logprob",
                "has_min_new",
                "has_logit_bias",
                "custom_procs",
                "with_eagle",
            ),
        )

    def _build_dump_step_fn(self):
        """Extend step variant for tensor-dump debugging: the model's
        debug_forward (per-layer residual hiddens) + the standard sampling
        chain.  Reference `debug_utils/dumper.py` (dump) +
        `dump_comparator.py` (compare; here scripts/dump_compare.py)."""
        model = self.model
        page_size = self.page_size

        def step(
            params, kv_pool, fb: ForwardBatch, sampling, rng, sample_mode,
            has_penalties=False, has_min_new=False, has_logit_bias=False,
        ):
            logits, kv_pool, aux = model.debug_forward(
                params, kv_pool, fb, page_size
            )
            raw_logits = logits
            if has_penalties:
                co, ca = sampler_ops.build_penalty_counts(
                    sampling, logits.shape[-1]
                )
                logits = sampler_ops.apply_penalties(logits, sampling, co, ca)
            if has_logit_bias:
                logits = sampler_ops.apply_logit_bias(logits, sampling)
            if sampling.vocab_mask is not None:
                logits = sampler_ops.apply_packed_vocab_mask(
                    logits, sampling.vocab_mask
                )
            if has_min_new:
                logits = sampler_ops.apply_min_new_tokens(logits, sampling, 0)
            if sample_mode == "greedy":
                toks = sampler_ops.sample_greedy(logits, sampling, rng)
            elif sample_mode == "simple":
                toks = sampler_ops.sample_simple(logits, sampling, rng)
            else:
                toks = sampler_ops.sample_full(logits, sampling, rng)
            return (toks, aux, raw_logits), kv_pool

        return jax.jit(
            step,
            donate_argnums=(1,),
            static_argnames=(
                "sample_mode", "has_penalties", "has_min_new",
                "has_logit_bias",
            ),
        )

    def _dump_write(self, kind: str, **arrays):
        self._dump_ct += 1
        path = os.path.join(
            self.dump_dir, f"{self._dump_ct:06d}_{kind}.npz"
        )
        np.savez(
            path,
            **{
                k: np.asarray(v)
                for k, v in arrays.items()
                if v is not None
            },
        )

    def _build_multi_step_fn(self):
        """K decode steps fused in one jit with on-device token feedback —
        the TPU answer to per-step dispatch latency (and the clean version
        of the reference's overlap scheduler's future-token loop,
        `tp_worker_overlap_thread.py:45`)."""
        model = self.model
        ps = self.page_size

        def multi(
            params,
            kv_pool,
            tokens,  # [B] last sampled token per req
            page_tables,  # [B, P]
            seq_lens,  # [B] current fill length (incl. `tokens`)
            limits,  # [B] fill-length limit for this window
            sampling,
            rng,
            n_steps,
            sample_mode,
            return_logprob=False,
            top_logprobs_k=0,
            has_penalties=False,
            has_min_new=False,
            has_logit_bias=False,
            custom_procs=(),
            lora_ids=None,
            fsm=None,
            has_fsm=False,
            swa_page_tables=None,
            mrope_delta=None,
            moe_acc=None,
            track_moe=False,
            mm_cross=None,  # (mm_slots, mm_first_pos, mm_vis_len, mm_vis_total)
        ):
            if has_penalties:
                vocab = params["embed"].shape[0]
                co0, ca0 = sampler_ops.build_penalty_counts(sampling, vocab)
            else:
                co0 = ca0 = jnp.zeros((), jnp.float32)
            if has_fsm:
                # On-device grammar FSM: per-request dense DFA state walks
                # the stacked byte/mask tables each step, so constrained
                # decoding keeps the fused K-step window (vs the
                # reference's per-token host mask fill overlapped with
                # forward, `model_runner.py:1703`).
                f_bt, f_mt, f_tb, f_tl, f_gidx, gs0, f_eos = fsm
                FIN = f_bt.shape[1] - 2
            else:
                gs0 = jnp.zeros_like(tokens)

            acc0 = moe_acc if track_moe else jnp.zeros((), jnp.int32)

            def body(carry, k):
                kv_pool, toks, lens, co, ca, gs, acc = carry
                active = lens < limits
                pos = jnp.maximum(lens - 1, 0)
                page = jnp.take_along_axis(
                    page_tables, (pos // ps)[:, None], axis=1
                )[:, 0]
                slot = jnp.where(active, page * ps + pos % ps, 0)
                mm = mm_cross or (None, None, None, None)
                fb = ForwardBatch(
                    input_ids=toks[:, None],
                    positions=pos[:, None],
                    out_slots=slot[:, None],
                    page_tables=page_tables,
                    seq_lens=lens,
                    extend_seq_lens=None,
                    extend_prefix_lens=None,
                    lora_ids=lora_ids,
                    swa_page_tables=swa_page_tables,
                    mrope_delta=mrope_delta,
                    mm_slots=mm[0],
                    mm_first_pos=mm[1],
                    mm_vis_len=mm[2],
                    mm_vis_total=mm[3],
                )
                if track_moe:
                    # EPLB load recorder: per-expert routed-token counts
                    # accumulate on device; fetched only at rebalance time
                    logits, kv_pool, stats = model(
                        params, kv_pool, fb, ps,
                        collect_moe=True, moe_mask=active,
                    )
                    acc = acc + stats
                else:
                    logits, kv_pool = model(params, kv_pool, fb, ps)
                if has_penalties:
                    logits = sampler_ops.apply_penalties(logits, sampling, co, ca)
                if has_logit_bias:
                    logits = sampler_ops.apply_logit_bias(logits, sampling)
                if custom_procs:
                    logits = apply_custom_processors(
                        logits, sampling.custom_slot,
                        sampling.custom_params, custom_procs,
                    )
                if sampling.vocab_mask is not None:
                    logits = sampler_ops.apply_packed_vocab_mask(
                        logits, sampling.vocab_mask
                    )
                if has_fsm:
                    logits = sampler_ops.apply_packed_vocab_mask(
                        logits, f_mt[f_gidx, gs]
                    )
                if has_min_new:
                    logits = sampler_ops.apply_min_new_tokens(logits, sampling, k)
                krng = jax.random.fold_in(rng, k)
                if sample_mode == "greedy":
                    nt = sampler_ops.sample_greedy(logits, sampling, krng)
                elif sample_mode == "simple":
                    nt = sampler_ops.sample_simple(logits, sampling, krng)
                else:
                    nt = sampler_ops.sample_full(logits, sampling, krng)
                nt = jnp.where(active, nt, 0)
                if has_fsm:
                    # advance the DFA over the sampled token's bytes
                    tlen = f_tl[nt]

                    def bstep(i, s):
                        b = f_tb[nt, i].astype(jnp.int32)
                        return jnp.where(i < tlen, f_bt[f_gidx, s, b], s)

                    gs_next = jax.lax.fori_loop(
                        0, f_tb.shape[1], bstep, gs
                    )
                    gs_next = jnp.where(nt == f_eos, FIN, gs_next)
                    gs = jnp.where(active, gs_next, gs)
                lens = jnp.where(active, lens + 1, lens)
                if has_penalties:
                    co, ca = sampler_ops.update_penalty_counts(co, ca, nt, active)
                if return_logprob:
                    logprobs = jax.nn.log_softmax(
                        logits.astype(jnp.float32), axis=-1
                    )
                    chosen = jnp.take_along_axis(logprobs, nt[:, None], -1)[:, 0]
                    if top_logprobs_k > 0:
                        tv, ti = jax.lax.top_k(logprobs, top_logprobs_k)
                    else:
                        tv = ti = jnp.zeros((nt.shape[0], 0), jnp.float32)
                    ys = (nt, chosen, tv, ti)
                else:
                    ys = nt
                return (kv_pool, nt, lens, co, ca, gs, acc), ys

            (kv_pool, _, _, _, _, _, acc), ys = jax.lax.scan(
                body,
                (kv_pool, tokens, seq_lens, co0, ca0, gs0, acc0),
                jnp.arange(n_steps),
            )
            if return_logprob:
                toks, chosen, tv, ti = ys
                out = (
                    toks.T,
                    chosen.T,
                    jnp.swapaxes(tv, 0, 1),
                    jnp.swapaxes(ti, 0, 1),
                )
            else:
                out = ys.T  # [B, K]
            if track_moe:
                return out, kv_pool, acc
            return out, kv_pool

        return jax.jit(
            multi,
            donate_argnums=(1,),
            static_argnames=(
                "n_steps",
                "sample_mode",
                "return_logprob",
                "top_logprobs_k",
                "has_penalties",
                "has_min_new",
                "has_logit_bias",
                "custom_procs",
                "has_fsm",
                "track_moe",
            ),
        )

    # ------------------------------------------------------------------
    def _buckets(self, mwb: ModelWorkerBatch):
        B = len(mwb.seq_lens)
        bs_bucket = next_power_of_2(B)
        if self.pp > 1:
            # GPipe microbatching needs the bucket divisible by the stage
            # count (pp is a power of two, so any bucket >= pp works)
            bs_bucket = max(bs_bucket, self.pp)
        max_pages = mwb.page_tables.shape[1]
        pages_bucket = max(next_power_of_2(max_pages), 8)
        return bs_bucket, pages_bucket

    def _fsm_args(self, mwb: ModelWorkerBatch, bs_bucket: int):
        """Build (and cache on device) the stacked grammar-FSM tables for a
        fused decode window (see constrained/device_fsm.py).  The stacked
        byte/mask tables and per-vocab token-byte tables are uploaded once
        per unique grammar set / vocab — windows reuse the device arrays."""
        if mwb.grammar_fsm is None:
            return None
        from sglang_npu_tpu.constrained.device_fsm import (
            stack_grammars,
            token_byte_arrays,
        )

        grams, gidx, gstate, vocab = mwb.grammar_fsm
        if not hasattr(self, "_fsm_stack_cache"):
            self._fsm_stack_cache = {}
            self._fsm_token_cache = {}
        nwords = (vocab.vocab_size + 31) // 32
        key = tuple(id(g) for g in grams)
        ent = self._fsm_stack_cache.get(key)
        if ent is None:
            bt, mt, FIN, DEAD = stack_grammars(
                grams, nwords, vocab.eos_token_id
            )
            ent = (jnp.asarray(bt), jnp.asarray(mt), FIN, DEAD)
            if len(self._fsm_stack_cache) >= 16:
                self._fsm_stack_cache.clear()
            self._fsm_stack_cache[key] = ent
        bt_dev, mt_dev, FIN, DEAD = ent
        tok = self._fsm_token_cache.get(id(vocab))
        if tok is None:
            tb, tl = token_byte_arrays(vocab)
            V = self.model_config.vocab_size
            if tb.shape[0] < V:  # defensive: table must cover sampled ids
                tb = np.pad(tb, ((0, V - tb.shape[0]), (0, 0)))
                tl = np.pad(tl, (0, V - tl.shape[0]))
            tok = (jnp.asarray(tb), jnp.asarray(tl))
            self._fsm_token_cache[id(vocab)] = tok
        tb_dev, tl_dev = tok
        gs = np.where(gstate == -1, FIN, np.where(gstate == -2, DEAD, gstate))
        gidx_p = jnp.asarray(pad_to(gidx.astype(np.int32), bs_bucket))
        gs_p = jnp.asarray(
            pad_to(gs.astype(np.int32), bs_bucket, fill=np.int32(FIN))
        )
        eos = vocab.eos_token_id if vocab.eos_token_id is not None else -1
        return (
            bt_dev,
            mt_dev,
            tb_dev,
            tl_dev,
            gidx_p,
            gs_p,
            jnp.asarray(np.int32(eos)),
        )

    def _sample_mode(self, mwb: ModelWorkerBatch) -> str:
        s = mwb.sampling_info
        if s.is_all_greedy:
            return "greedy"
        if (
            np.all(s.top_ps >= 1.0)
            and np.all(s.top_ks >= self.model_config.vocab_size)
            and np.all(s.min_ps <= 0.0)
        ):
            return "simple"
        return "full"

    # ------------------------------------------------------------------
    # Multimodal: ViT execution + embedding splice (reference
    # `managers/mm_utils.general_mm_embed_routine` + embed cache)
    # ------------------------------------------------------------------
    def _vision_embed(self, req) -> jax.Array:
        """Run the vision tower once per request; embeddings are cached on
        the Req for subsequent prefill chunks AND in a content-hash LRU
        across requests (reference `mem_cache/multimodal_cache.py:48`), so
        a repeated image prompt never re-runs the ViT.  Layout/padding
        policy is model-specific (windowed qwen ViT vs plain CLIP/SigLIP
        towers), so the model owns it via `compute_vision_embeds`."""
        if req.mm_embeds is not None:
            return req.mm_embeds
        if not hasattr(self, "_mm_embed_cache"):
            from collections import OrderedDict

            self._mm_embed_cache = OrderedDict()
        key = getattr(req, "mm_cache_key", None)
        if key is None:
            import hashlib

            # hash only the media CONTENT: prompt-dependent fields (token
            # ids, radix key ids, mrope tables) don't affect the tower, so
            # the same image under a different prompt still hits.  Unknown
            # future keys stay IN the hash — worst case an extra miss,
            # never a wrong reuse.
            skip = {"input_ids", "key_ids", "mrope_positions", "mrope_delta"}
            h = hashlib.sha256()
            for name in sorted(req.mm_inputs):
                if name in skip:
                    continue
                v = req.mm_inputs[name]
                h.update(name.encode())
                if isinstance(v, np.ndarray):
                    h.update(v.tobytes())
                else:
                    h.update(repr(v).encode())
            key = req.mm_cache_key = h.digest()
        cached = self._mm_embed_cache.get(key)
        if cached is not None:
            self._mm_embed_cache.move_to_end(key)
            self.mm_embed_cache_hits = (
                getattr(self, "mm_embed_cache_hits", 0) + 1
            )
            req.mm_embeds = cached
            return cached
        if not hasattr(self, "_vision_fn"):
            self._vision_fn = jax.jit(self.model.vision_forward)
        req.mm_embeds = self.model.compute_vision_embeds(
            self.params, req.mm_inputs, self._vision_fn
        )
        self._mm_embed_cache[key] = req.mm_embeds
        while len(self._mm_embed_cache) > max(
            self.server_args.mm_embed_cache_entries, 0
        ):
            self._mm_embed_cache.popitem(last=False)
        return req.mm_embeds

    def _attach_mm_embeds(self, mwb, fb, bs_bucket: int, extend_bucket: int):
        """Splice vision embeddings into the extend rectangle (and, for
        models with same-image bidirectional attention, the per-position
        image-group map)."""
        import dataclasses as _dc

        D = self.model_config.hidden_size
        embeds = jnp.zeros(
            (bs_bucket, extend_bucket, D),
            jnp.bfloat16
            if self.model_config.dtype == "bfloat16"
            else jnp.float32,
        )
        mask = np.zeros((bs_bucket, extend_bucket), dtype=bool)
        touched = False
        for i, req in enumerate(mwb.mm_reqs):
            if req is None:
                continue
            start = req.prefix_len
            end = start + req.extend_input_len
            pos = req.mm_token_positions
            sel = (pos >= start) & (pos < end)
            if not sel.any():
                continue
            rows = self._vision_embed(req)[np.where(sel)[0]]
            cols = (pos[sel] - start).astype(np.int32)
            embeds = embeds.at[i, cols].set(rows.astype(embeds.dtype))
            mask[i, cols] = True
            touched = True
        groups = None
        if getattr(self.model, "needs_mm_groups", False):
            Lkv = fb.page_tables.shape[1] * self.page_size
            g = np.full((bs_bucket, Lkv), -1, dtype=np.int32)
            for i, req in enumerate(mwb.mm_reqs):
                gp = getattr(req, "mm_groups_prompt", None) if req else None
                if gp is None:
                    continue
                n = min(len(gp), Lkv)
                g[i, :n] = gp[:n]
            groups = jnp.asarray(g)
        if not touched and groups is None:
            return fb
        if not touched:
            return _dc.replace(fb, mm_groups=groups)
        return _dc.replace(
            fb, input_embeds=embeds, embed_mask=jnp.asarray(mask),
            mm_groups=groups,
        )

    # ------------------------------------------------------------------
    def forward_and_sample(self, mwb: ModelWorkerBatch):
        """Run one padded step.

        Extend: returns (tokens [real_bs], logprob_info | None).
        Decode: runs mwb.decode_steps fused steps; tokens [real_bs, K].
        logprob_info = {"chosen": ..., "top_vals": ..., "top_ids": ...}.
        """
        restore = None
        if self.dp_attn:
            from sglang_npu_tpu.model_executor.dp_attention import (
                dp_reorder_mwb,
            )

            mwb, restore = dp_reorder_mwb(
                mwb, self.dp_attn, self.pages_local, self.page_size
            )
        bs_bucket, pages_bucket = self._buckets(mwb)
        sampling = build_sampling_device(mwb, bs_bucket)
        self.step_counter += 1
        rng = self._step_rng(self.step_counter)
        rl, tk = mwb.return_logprob, mwb.top_logprobs_k

        if mwb.forward_mode == ForwardMode.EXTEND:
            extend_bucket = max(
                next_power_of_2(int(np.max(mwb.extend_seq_lens))), 16
            )
            fb = build_extend_forward_batch(
                mwb, bs_bucket, extend_bucket, pages_bucket, self.page_size
            )
            if mwb.mm_reqs is not None:
                if getattr(self.model, "mm_cross_attention", False):
                    # mllama-class: run the tower once per request; the
                    # cross K/V land in the pool's slot buffers (no embed
                    # splice — the <|image|> token embeds normally)
                    for req in mwb.mm_reqs:
                        if (
                            req is not None
                            and req.mm_slot_cross is not None
                            and not req.mm_cross_prepared
                        ):
                            self.kv_pool = self.model.prepare_cross(
                                self.params, self.kv_pool,
                                req.mm_inputs, req.mm_slot_cross,
                            )
                            req.mm_cross_prepared = True
                else:
                    fb = self._attach_mm_embeds(
                        mwb, fb, bs_bucket, extend_bucket
                    )
            with_eagle = (
                self.eagle is not None
                and mwb.hidden_slots is not None
                and not rl
            )
            if with_eagle:
                out, self.kv_pool, eagle_state = self._step_fn(
                    self.params,
                    self.kv_pool,
                    fb,
                    sampling,
                    rng,
                    sample_mode=self._sample_mode(mwb),
                    has_penalties=mwb.sampling_info.has_penalties,
                    has_min_new=mwb.sampling_info.has_min_new,
                    custom_procs=mwb.sampling_info.custom_proc_keys or (),
                    d_params=self.eagle.params,
                    eagle_state=(self.eagle.kv_pool, self.eagle.hidden_buf),
                    hidden_slots=jnp.asarray(
                        pad_to(mwb.hidden_slots, bs_bucket)
                    ),
                    eagle_first=jnp.asarray(
                        pad_to(mwb.eagle_first, bs_bucket, fill=True)
                    ),
                    with_eagle=True,
                )
                self.eagle.kv_pool, self.eagle.hidden_buf = eagle_state
                return np.asarray(fetch_np(out))[: mwb.real_bs], None
            if (
                self.dump_dir
                and self._dump_step_fn is not None
                and not rl
                and restore is None
            ):
                out, self.kv_pool = self._dump_step_fn(
                    self.params,
                    self.kv_pool,
                    fb,
                    sampling,
                    rng,
                    sample_mode=self._sample_mode(mwb),
                    has_penalties=mwb.sampling_info.has_penalties,
                    has_min_new=mwb.sampling_info.has_min_new,
                    has_logit_bias=mwb.sampling_info.has_logit_bias,
                )
                toks, aux, raw_logits = out
                n = mwb.real_bs
                self._dump_write(
                    "extend",
                    input_ids=fb.input_ids[:n],
                    positions=fb.positions[:n],
                    extend_seq_lens=mwb.extend_seq_lens,
                    hidden=aux[:, :n],
                    logits=raw_logits[:n],
                    tokens=np.asarray(fetch_np(toks))[:n],
                )
                return np.asarray(fetch_np(toks))[:n], None
            out, self.kv_pool = self._step_fn(
                self.params,
                self.kv_pool,
                fb,
                sampling,
                rng,
                sample_mode=self._sample_mode(mwb),
                return_logprob=rl,
                top_logprobs_k=tk,
                has_penalties=mwb.sampling_info.has_penalties,
                return_input_logprob=mwb.return_input_logprob and rl,
                has_min_new=mwb.sampling_info.has_min_new,
                has_logit_bias=mwb.sampling_info.has_logit_bias,
                custom_procs=mwb.sampling_info.custom_proc_keys or (),
            )
        else:
            # decode: fused multi-step window, dispatch + fetch split so
            # the scheduler can pipeline windows (decode_dispatch below)
            handle = self.decode_dispatch(mwb)
            return self.decode_fetch(handle)
        n = mwb.real_bs
        # dp_attn rows are rank-major; `restore` maps them back to the
        # scheduler's original request order
        take = (
            (lambda a: a[restore])
            if restore is not None
            else (lambda a: a[:n])
        )
        if not rl:
            return take(np.asarray(fetch_np(out))), None
        got = tuple(fetch_np(o) for o in out) if isinstance(out, (tuple, list)) else fetch_np(out)
        if len(got) == 5:
            toks, chosen, tv, ti, inp_lp = got
        else:
            toks, chosen, tv, ti = got
            inp_lp = None
        info = {
            "chosen": take(np.asarray(chosen)),
            "top_vals": take(np.asarray(tv)) if tk > 0 else None,
            "top_ids": take(np.asarray(ti)) if tk > 0 else None,
            "input_logprobs": (
                take(np.asarray(inp_lp)) if inp_lp is not None else None
            ),
        }
        return take(np.asarray(toks)), info

    # ------------------------------------------------------------------
    def decode_dispatch(self, mwb: ModelWorkerBatch, chain_from=None):
        """Dispatch one fused decode window WITHOUT fetching results.

        The TPU answer to the reference's zero-overhead overlap scheduler
        (`tp_worker_overlap_thread.py:53`, future-token map `:45`): JAX
        async dispatch returns device futures, so the scheduler can queue
        window N+1 — with ``chain_from`` feeding window N's last sampled
        tokens straight from the device output, no host round trip — while
        window N is still executing.  This hides both host work and the
        dispatch/fetch link latency (30 ms on the tunneled chip) behind
        device compute.

        Chaining is only offered (``handle.chainable``) when the window's
        sampling state is memoryless across windows: no penalties (token
        counts evolve on host), no grammar FSM (host tracks states), no
        logprobs, no DP-attention reorder."""
        restore = None
        if self.dp_attn:
            from sglang_npu_tpu.model_executor.dp_attention import (
                dp_reorder_mwb,
            )

            mwb, restore = dp_reorder_mwb(
                mwb, self.dp_attn, self.pages_local, self.page_size
            )
        bs_bucket, pages_bucket = self._buckets(mwb)
        sampling = build_sampling_device(mwb, bs_bucket)
        self.step_counter += 1
        rng = self._step_rng(self.step_counter)
        rl, tk = mwb.return_logprob, mwb.top_logprobs_k
        K = mwb.decode_steps
        pt = pad_to(
            pad_to(mwb.page_tables, pages_bucket, axis=1), bs_bucket, axis=0
        )
        fsm = self._fsm_args(mwb, bs_bucket)
        if chain_from is not None:
            assert chain_from.last_tokens is not None
            assert chain_from.bs_bucket == bs_bucket
            tokens = chain_from.last_tokens
        else:
            tokens = jnp.asarray(pad_to(mwb.input_ids, bs_bucket))
        res = self._multi_fn(
            self.params,
            self.kv_pool,
            tokens,
            jnp.asarray(pt),
            jnp.asarray(pad_to(mwb.seq_lens, bs_bucket)),
            jnp.asarray(pad_to(mwb.decode_limits, bs_bucket)),
            sampling,
            rng,
            n_steps=K,
            sample_mode=self._sample_mode(mwb),
            return_logprob=rl,
            top_logprobs_k=tk,
            has_penalties=mwb.sampling_info.has_penalties,
            has_min_new=mwb.sampling_info.has_min_new,
            has_logit_bias=mwb.sampling_info.has_logit_bias,
            custom_procs=mwb.sampling_info.custom_proc_keys or (),
            lora_ids=(
                jnp.asarray(pad_to(mwb.lora_ids, bs_bucket))
                if mwb.lora_ids is not None
                else None
            ),
            fsm=fsm,
            has_fsm=fsm is not None,
            swa_page_tables=(
                jnp.asarray(pad_to(mwb.swa_page_tables, bs_bucket))
                if mwb.swa_page_tables is not None
                else None
            ),
            mm_cross=(
                tuple(
                    jnp.asarray(
                        pad_to(
                            np.asarray(getattr(mwb, f), np.int32),
                            bs_bucket,
                            fill=fill,
                        )
                    )
                    for f, fill in (
                        ("mm_slots", 0),
                        ("mm_first_pos", 1 << 30),
                        ("mm_vis_len", 0),
                        ("mm_vis_total", 0),
                    )
                )
                if getattr(mwb, "mm_slots", None) is not None
                else None
            ),
            mrope_delta=(
                jnp.asarray(pad_to(mwb.mrope_delta, bs_bucket))
                if mwb.mrope_delta is not None
                else None
            ),
            moe_acc=self._moe_acc,
            track_moe=self.eplb is not None,
        )
        if self.eplb is not None:
            out, self.kv_pool, self._moe_acc = res
            self._eplb_steps += K
        else:
            out, self.kv_pool = res
        chainable = (
            not rl
            and fsm is None
            # a host-built grammar vocab mask is only valid for ONE token;
            # a chained window would reuse it stale
            and mwb.sampling_info.vocab_mask is None
            and restore is None
            and not mwb.sampling_info.has_penalties
            and not mwb.sampling_info.has_min_new
            and not mwb.sampling_info.has_logit_bias
        )
        return DecodeHandle(
            out=out,
            last_tokens=out[:, -1] if chainable else None,
            mwb=mwb,
            restore=restore,
            rl=rl,
            tk=tk,
            bs_bucket=bs_bucket,
            chainable=chainable,
        )

    def decode_fetch(self, handle: "DecodeHandle"):
        """Fetch a dispatched decode window's sampled tokens (+logprobs)."""
        mwb, out, restore = handle.mwb, handle.out, handle.restore
        rl, tk = handle.rl, handle.tk
        if self.eplb is not None and self._eplb_steps >= self._eplb_interval:
            self.rebalance_experts()
        n = mwb.real_bs
        take = (
            (lambda a: a[restore]) if restore is not None else (lambda a: a[:n])
        )
        if not rl:
            toks = take(np.asarray(fetch_np(out)))
            if self.dump_dir:
                self._dump_write(
                    "decode", seq_lens=mwb.seq_lens, tokens=toks
                )
            return toks, None
        got = tuple(fetch_np(o) for o in out)
        if len(got) == 5:
            toks, chosen, tv, ti, inp_lp = got
        else:
            toks, chosen, tv, ti = got
            inp_lp = None
        info = {
            "chosen": take(np.asarray(chosen)),
            "top_vals": take(np.asarray(tv)) if tk > 0 else None,
            "top_ids": take(np.asarray(ti)) if tk > 0 else None,
            "input_logprobs": (
                take(np.asarray(inp_lp)) if inp_lp is not None else None
            ),
        }
        return take(np.asarray(toks)), info

    def _step_rng(self, step: int):
        """Per-step RNG key. fold_in is jitted with a device scalar so the
        changing step id does NOT trigger a retrace (an eager fold_in with a
        python int recompiles every step — catastrophic on remote-compile
        backends)."""
        if not hasattr(self, "_fold_fn"):
            self._fold_fn = jax.jit(jax.random.fold_in)
        return self._fold_fn(self.rng_base, np.uint32(step % (1 << 31)))

    def forward_verify(self, mwb: ModelWorkerBatch, draft_tokens: np.ndarray):
        """Target-verify forward for speculative decoding (reference
        `TARGET_VERIFY` mode, `eagle_worker.verify:668`): feed
        [last_token, d1..dS] as a small extend, return the target's greedy
        prediction at every fed position ([real_bs, S+1])."""
        B = mwb.real_bs
        S = draft_tokens.shape[1]
        K = S + 1
        # pad fed width to a page multiple so the fused pallas prefill
        # kernel handles the KV writes (and to keep one bucket)
        E = max(
            ((K + self.page_size - 1) // self.page_size) * self.page_size, 16
        )
        bs_bucket, pages_bucket = self._buckets(mwb)

        rect_ids = np.zeros((bs_bucket, E), dtype=np.int32)
        rect_pos = np.zeros((bs_bucket, E), dtype=np.int32)
        rect_slots = np.zeros((bs_bucket, E), dtype=np.int32)
        fed = np.concatenate([mwb.input_ids[:, None], draft_tokens], axis=1)
        rect_ids[:B, :K] = fed
        for i in range(B):
            L = int(mwb.seq_lens[i])
            rect_pos[i, :E] = (L - 1) + np.arange(E)
            rect_slots[i, :K] = mwb.out_slots[i, :K]
        pt = self._pad_pt(mwb, bs_bucket, pages_bucket)
        seq_pad = np.zeros(bs_bucket, np.int32)
        seq_pad[:B] = mwb.seq_lens + S
        ext_pad = np.zeros(bs_bucket, np.int32)
        ext_pad[:B] = K
        pre_pad = np.zeros(bs_bucket, np.int32)
        pre_pad[:B] = mwb.seq_lens - 1
        fb = ForwardBatch(
            input_ids=jnp.asarray(rect_ids),
            positions=jnp.asarray(rect_pos),
            out_slots=jnp.asarray(rect_slots),
            page_tables=jnp.asarray(pt),
            seq_lens=jnp.asarray(seq_pad),
            extend_seq_lens=jnp.asarray(ext_pad),
            extend_prefix_lens=jnp.asarray(pre_pad),
        )
        if not hasattr(self, "_verify_fn"):
            model = self.model
            ps = self.page_size

            def vf(params, kv_pool, fb):
                x, kv_pool = model.backbone_forward(params, kv_pool, fb, ps)
                head = (
                    params["embed"]
                    if "lm_head" not in params
                    else params["lm_head"].T
                )
                logits = jnp.einsum(
                    "bed,vd->bev", x, head, preferred_element_type=jnp.float32
                )
                return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv_pool

            self._verify_fn = jax.jit(vf, donate_argnums=(1,))
        preds, self.kv_pool = self._verify_fn(self.params, self.kv_pool, fb)
        return np.asarray(fetch_np(preds))[:B, :K]

    def _pad_pt(self, mwb, bs_bucket, pages_bucket):
        from sglang_npu_tpu.model_executor.forward_batch_info import pad_to

        return pad_to(
            pad_to(mwb.page_tables, pages_bucket, axis=1), bs_bucket, axis=0
        )

    def _maybe_dp_reorder(self, mwb):
        if not self.dp_attn:
            return mwb, None
        from sglang_npu_tpu.model_executor.dp_attention import dp_reorder_mwb

        return dp_reorder_mwb(
            mwb, self.dp_attn, self.pages_local, self.page_size
        )

    def forward_embedding(self, mwb: ModelWorkerBatch) -> np.ndarray:
        """Pooled embeddings for a prefill batch; [real_bs, hidden] f32."""
        mwb, restore = self._maybe_dp_reorder(mwb)
        bs_bucket, pages_bucket = self._buckets(mwb)
        extend_bucket = max(next_power_of_2(int(np.max(mwb.extend_seq_lens))), 16)
        fb = build_extend_forward_batch(
            mwb, bs_bucket, extend_bucket, pages_bucket, self.page_size
        )
        if not hasattr(self, "_embed_fn"):
            model = self.model
            ps = self.page_size

            def step(params, kv_pool, fb):
                return model.embed_forward(params, kv_pool, fb, ps)

            self._embed_fn = jax.jit(step, donate_argnums=(1,))
        emb, self.kv_pool = self._embed_fn(self.params, self.kv_pool, fb)
        emb = np.asarray(fetch_np(emb))
        return emb[restore] if restore is not None else emb[: mwb.real_bs]

    def forward_logits(self, mwb: ModelWorkerBatch) -> np.ndarray:
        """Run one step returning last-token logits [real_bs, vocab]
        (numerics tests, scoring, logprobs)."""
        mwb, restore = self._maybe_dp_reorder(mwb)
        bs_bucket, pages_bucket = self._buckets(mwb)
        if mwb.forward_mode == ForwardMode.EXTEND:
            extend_bucket = max(
                next_power_of_2(int(np.max(mwb.extend_seq_lens))), 16
            )
            fb = build_extend_forward_batch(
                mwb, bs_bucket, extend_bucket, pages_bucket, self.page_size
            )
        else:
            fb = build_decode_forward_batch(mwb, bs_bucket, pages_bucket)
        sampling = build_sampling_device(mwb, bs_bucket)
        rng = jax.random.fold_in(self.rng_base, 0)
        logits, self.kv_pool = self._step_fn(
            self.params, self.kv_pool, fb, sampling, rng, sample_mode="logits"
        )
        logits = np.asarray(fetch_np(logits))
        return (
            logits[restore] if restore is not None else logits[: mwb.real_bs]
        )

    # ------------------------------------------------------------------
    def flush_kv(self):
        """Zero out the pool (used by /flush_cache).  Donated so the
        buffers are reused in place — a fresh allocation would transiently
        double pool memory and OOM large configs."""
        if not hasattr(self, "_zero_pool_fn"):
            self._zero_pool_fn = jax.jit(
                lambda t: jax.tree_util.tree_map(jnp.zeros_like, t),
                donate_argnums=(0,),
            )
        self.kv_pool = self._zero_pool_fn(self.kv_pool)

    # ------------------------------------------------------------------
    def copy_swa_pages(self, src, dst) -> None:
        """Copy window-pool pages ``src`` -> ``dst`` on device (snapshot
        restore for SWARadixCache, copy-on-extend)."""
        from sglang_npu_tpu.ops.hybrid_kv import HybridKVPool

        if not hasattr(self, "_swa_copy_fn"):

            @functools.partial(jax.jit, donate_argnums=(0,))
            def _copy(pool, s, d):
                swa = pool.swa.at[:, :, :, d].set(pool.swa[:, :, :, s])
                return HybridKVPool(full=pool.full, swa=swa)

            self._swa_copy_fn = _copy
        nw = self.swa_ring_pages
        s = np.zeros((nw,), np.int32)
        d = np.zeros((nw,), np.int32)
        s[: len(src)] = src
        d[: len(dst)] = dst  # padded entries copy page 0 onto itself
        self.kv_pool = self._swa_copy_fn(
            self.kv_pool, jnp.asarray(s), jnp.asarray(d)
        )

    # ------------------------------------------------------------------
    # KV page IO for the hierarchical cache (reference kvcacheio transfer
    # kernels; here jitted gather/scatter over the paged pool)
    # ------------------------------------------------------------------
    @property
    def kv_bytes_per_token(self) -> int:
        return self.model_config.kv_bytes_per_token(
            jnp.dtype(self.kv_dtype).itemsize
        )

    def _kv_io_fns(self):
        if not hasattr(self, "_gather_fn"):
            from sglang_npu_tpu.ops.mla_attention import MLALatentPool
            from sglang_npu_tpu.ops.pallas.quant_kv import (
                PagedQuantKV,
                dequant_rows,
                quant_store_rows,
            )

            if isinstance(self.kv_pool, MLALatentPool):
                # latent rows travel as [L, 1, 1, n, R+KPE_PAD] so the
                # opaque HiCache/PD plumbing (axis 3 = token) still works
                R = self.kv_pool.ckv.shape[-1]

                @jax.jit
                def g(pool, pages, offs):
                    rows = jnp.concatenate(
                        [
                            pool.ckv[:, pages, offs],
                            pool.kpe[:, pages, offs],
                        ],
                        axis=-1,
                    )  # [L, n, R+Rp]
                    return rows[:, None, None]

                @functools.partial(jax.jit, donate_argnums=(0,))
                def s(pool, pages, offs, vals):
                    rows = vals[:, 0, 0]  # [L, n, R+Rp]
                    return MLALatentPool(
                        ckv=pool.ckv.at[:, pages, offs].set(
                            rows[..., :R].astype(pool.ckv.dtype), mode="drop"
                        ),
                        kpe=pool.kpe.at[:, pages, offs].set(
                            rows[..., R:].astype(pool.kpe.dtype), mode="drop"
                        ),
                    )

            elif isinstance(self.kv_pool, PagedQuantKV):
                # quantized pallas pool: backup/handoff in dequantized f32,
                # restore with fresh per-(head, page) scales (restored
                # prefixes are page-aligned so the pages are wholly ours)
                @jax.jit
                def g(pool, pages, offs):
                    return dequant_rows(pool, pages, offs).astype(jnp.bfloat16)

                @functools.partial(jax.jit, donate_argnums=(0,))
                def s(pool, pages, offs, vals):
                    return quant_store_rows(pool, pages, offs, vals)

            else:

                @jax.jit
                def g(pool, pages, offs):
                    return pool[:, :, :, pages, offs]  # [L, 2, H, n, D]

                @functools.partial(jax.jit, donate_argnums=(0,))
                def s(pool, pages, offs, vals):
                    return pool.at[:, :, :, pages, offs].set(vals, mode="drop")

            self._gather_fn, self._scatter_fn = g, s
        return self._gather_fn, self._scatter_fn

    def gather_kv_dispatch(self, slots: np.ndarray):
        """Dispatch the on-device KV row gather (cheap; scheduler thread).

        Returns an opaque handle for `gather_kv_fetch`.  The gathered rows
        are a fresh device array computed at dispatch order, so the source
        pool pages may be freed/overwritten immediately afterwards — the
        slow device->host fetch can run on a background thread (async
        HiCache write-through, reference `cache_controller.py:215`).
        """
        g, _ = self._kv_io_fns()
        n = len(slots)
        padded = next_power_of_2(max(n, 8))
        sl = np.zeros(padded, np.int32)
        sl[:n] = slots
        out = g(
            self.kv_pool,
            jnp.asarray(sl // self.page_size),
            jnp.asarray(sl % self.page_size),
        )
        return (out, n)

    def gather_kv_fetch(self, handle) -> np.ndarray:
        """Device -> host fetch of a dispatched gather (slow; any thread)."""
        out, n = handle
        rows = np.asarray(fetch_np(out))[:, :, :, :n]
        c = self.model_config
        if not c.is_mla and rows.shape[-1] != c.head_dim:
            # drop the pallas lane padding: host backups / PD wire rows
            # stay at the model's true head_dim
            rows = rows[..., : c.head_dim]
        return rows

    def gather_kv(self, slots: np.ndarray) -> np.ndarray:
        """Device -> host copy of KV rows; [L, 2, H, n, D]."""
        return self.gather_kv_fetch(self.gather_kv_dispatch(slots))

    def scatter_kv_upload(self, host_kv: np.ndarray, n: int):
        """Host -> device upload of KV rows (slow; any thread).

        Returns an opaque handle for `scatter_kv_commit`.  Only pads and
        `device_put`s — does not touch the pool, so it is safe concurrent
        with forwards on the scheduler thread.
        """
        padded = next_power_of_2(max(n, 8))
        c = self.model_config
        if not c.is_mla and host_kv.shape[-1] == c.head_dim != self.kv_head_dim:
            host_kv = np.pad(
                host_kv,
                [(0, 0)] * (host_kv.ndim - 1)
                + [(0, self.kv_head_dim - c.head_dim)],
            )
        vals = np.zeros(
            host_kv.shape[:3] + (padded,) + host_kv.shape[4:], host_kv.dtype
        )
        vals[:, :, :, :n] = host_kv
        return (jax.device_put(jnp.asarray(vals)), n)

    def scatter_kv_commit(self, slots: np.ndarray, handle) -> None:
        """Write uploaded rows into the pool (cheap; scheduler thread only —
        mutates `self.kv_pool` with a donated update)."""
        _, s = self._kv_io_fns()
        vals, n = handle
        padded = vals.shape[3]
        sl = np.zeros(padded, np.int32)
        sl[:n] = slots
        self.kv_pool = s(
            self.kv_pool,
            jnp.asarray(sl // self.page_size),
            jnp.asarray(sl % self.page_size),
            vals,
        )

    def scatter_kv(self, slots: np.ndarray, kv) -> None:
        """Restore KV rows into the pool (layout from gather_kv).

        Accepts a host array (HTTP/shm transfer) or a `DeviceKV` handoff
        — the device path reshards the rows onto this runner's mesh
        (ICI/DCN on hardware) without any host round trip."""
        from sglang_npu_tpu.disaggregation import DeviceKV

        if isinstance(kv, DeviceKV):
            vals = jax.device_put(kv.rows, NamedSharding(self.mesh, P()))
            self.scatter_kv_commit(slots, (vals, kv.n))
            return
        self.scatter_kv_commit(slots, self.scatter_kv_upload(kv, len(slots))
        )

    # ------------------------------------------------------------------
    def rebalance_experts(self) -> bool:
        """EPLB rebalance (reference `srt/eplb/eplb_manager.py:20`
        `rebalance_experts`): fetch the accumulated per-expert load, compute
        a new logical->physical placement (redundant replicas of hot
        experts), permute the expert weight slots on device (one gather per
        weight leaf), swap the routing tables, and reset the recorder.
        Numerics-invariant: replicas share weights, so greedy outputs are
        bit-identical across a rebalance (tested in tests/test_eplb.py)."""
        if self.eplb is None:
            return False
        counts = np.asarray(fetch_np(self._moe_acc))
        self._eplb_steps = 0
        if counts.sum() == 0:
            return False
        gather, l2p, rc = self.eplb.rebalance(counts.astype(np.int64))
        self.params = self.model.eplb_permute(
            self.params,
            jnp.asarray(gather),
            jnp.asarray(l2p),
            jnp.asarray(rc),
        )
        self._moe_acc = jnp.zeros_like(self._moe_acc)
        self.eplb_rebalance_count += 1
        logger.info(
            "EPLB rebalance #%d applied (load imbalance max/mean = %.2f)",
            self.eplb_rebalance_count,
            float(counts.sum(0).max() / max(counts.sum(0).mean(), 1e-9)),
        )
        return True

    def expert_load_snapshot(self) -> Optional[np.ndarray]:
        """Current accumulated per-layer per-expert routed-token counts
        (reference `expert_distribution.py` dump RPC)."""
        if self._moe_acc is None:
            return None
        return np.asarray(fetch_np(self._moe_acc))

    # ------------------------------------------------------------------
    def _refresh_lora_params(self):
        """(Re)build the stacked adapter arrays from the manager's current
        slots and splice them into the live param tree."""
        additions = self.lora_manager.build_params()
        scaling = additions.pop("__scaling__")
        layers = {
            k: v
            for k, v in self.params["layers"].items()
            if not k.startswith("lora_")
        }
        layers.update(additions)
        self.params = dict(self.params)
        self.params["layers"] = layers
        self.params["lora_scaling"] = scaling

    def load_lora_adapter(self, lora_name: str, lora_path: str):
        """Dynamic adapter load (reference `/load_lora_adapter`,
        `http_server.py:625`).  Reusing a freed slot keeps array shapes
        (no recompile); a fresh slot grows the adapter dim (one-time
        recompile of the forward buckets)."""
        if self.lora_manager is None:
            return False, (
                "server not launched with LoRA enabled "
                "(--lora-paths or --enable-lora)"
            )
        ok, msg = self.lora_manager.add(lora_name, lora_path)
        if ok:
            self._refresh_lora_params()
        return ok, msg

    def unload_lora_adapter(self, lora_name: str):
        """Dynamic adapter unload: the slot zeroes (in-flight requests
        pinned to it degrade to the base model) and becomes reusable."""
        if self.lora_manager is None:
            return False, "server not launched with LoRA enabled"
        ok, msg = self.lora_manager.remove(lora_name)
        if ok:
            self._refresh_lora_params()
        return ok, msg

    def save_sharded_state(self, path: str) -> int:
        """Dump the prepared param tree (post quant/fusion) as per-host
        shards + the model config, so `path` works directly as a
        cold-start model_path (reference ShardedStateLoader /
        save_remote_model, `model_loader/loader.py:589`,
        `model_runner.py:1760`)."""
        import json as _json
        import shutil

        from sglang_npu_tpu.model_loader.sharded_state import (
            save_sharded_state,
        )

        n = save_sharded_state(self.params, path)
        if jax.process_index() == 0:
            src = os.path.join(self._model_path, "config.json")
            if os.path.exists(src):
                shutil.copy(src, os.path.join(path, "config.json"))
            else:
                with open(os.path.join(path, "config.json"), "w") as f:
                    _json.dump(self.model_config.hf_config, f, default=str)
            for aux in (
                "tokenizer.json", "tokenizer_config.json",
                "special_tokens_map.json", "generation_config.json",
            ):
                s = os.path.join(self._model_path, aux)
                if os.path.exists(s):
                    shutil.copy(s, os.path.join(path, aux))
        return n

    def update_weights_from_disk(self, model_path: str, load_format: str = "auto"):
        """Live weight swap (reference `model_runner.py:731`
        `update_weights_from_disk`, used for RL rollout weight sync)."""
        from sglang_npu_tpu.model_loader.loader import load_model_weights

        new_params = load_model_weights(
            self.model, model_path, load_format, self.mesh,
            seed=self.server_args.random_seed,
        )
        old = self.params
        self.params = new_params
        del old
        if self.eplb is not None:
            # fresh weights land in identity placement; reset the tables
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as PSpec

            from sglang_npu_tpu.layers.eplb import EplbState

            self.eplb = EplbState.initial(
                self.model.eplb_layer_count(),
                self.model.num_experts,
                self.server_args.ep_num_redundant_experts,
                self.server_args.ep_size,
            )
            repl = NamedSharding(self.mesh, PSpec())
            l2p0, rc0 = self.eplb.initial_tables()
            self.params = self.model.eplb_install_tables(
                self.params,
                jax.device_put(jnp.asarray(l2p0), repl),
                jax.device_put(jnp.asarray(rc0), repl),
            )
            self._moe_acc = jnp.zeros_like(self._moe_acc)
            self._eplb_steps = 0
        self.server_args.model_path = model_path
        return True, "weights updated"

    def init_weights_update_group(
        self, master_address: str, master_port: int = 0,
        group_name: str = "default",
    ):
        """Connect to a trainer's weight-publish socket (reference
        `init_weights_update_group`, `model_runner.py:831` — there a NCCL
        group; here the ZMQ control plane, see weight_sync.py)."""
        import zmq

        addr = master_address
        if "://" not in addr:
            addr = f"tcp://{addr}:{master_port}"
        ctx = zmq.Context.instance()
        sock = ctx.socket(zmq.PULL)
        sock.connect(addr)
        if not hasattr(self, "_wsync_socks"):
            self._wsync_socks = {}
        self._wsync_socks[group_name] = sock
        return True, f"weight update group {group_name!r} -> {addr}"

    def update_weights_from_distributed(
        self, names, group_name: str = "default"
    ):
        """Receive the named tensors from the trainer group and apply them
        in place (reference `update_weights_from_distributed`,
        `model_runner.py:869-914`)."""
        from sglang_npu_tpu.weight_sync import recv_named

        sock = getattr(self, "_wsync_socks", {}).get(group_name)
        if sock is None:
            return False, (
                f"weight update group {group_name!r} not initialized "
                "(call init_weights_update_group first)"
            )
        tensors = recv_named(sock, list(names))
        return self.update_weights_from_tensor(tensors)

    def update_weights_from_tensor(self, named_tensors):
        """In-memory weight sync (reference
        `update_weights_from_tensor`, RL rollout weight push): HF-named
        host tensors resolve through the model's weight map and update the
        device pytree in place — stacked layer weights via a per-row
        `.at[layer].set`, top-level weights via a sharded device_put."""
        from sglang_npu_tpu.model_loader.loader import _get_path, _set_path

        top_map, per_layer_map = self.model.hf_weight_map()
        params = self.params
        n = 0
        for name, arr in named_tensors:
            arr = np.asarray(arr)
            dest = transform = None
            layer_idx = None
            if name in top_map:
                dest, transform = top_map[name]
            elif name.startswith("model.layers."):
                parts = name.split(".")
                layer_idx = int(parts[2])
                suffix = ".".join(parts[3:])
                if suffix in per_layer_map:
                    dest, transform = per_layer_map[suffix]
            if dest is None or ".__expert__" in (dest or ""):
                raise ValueError(f"cannot map weight {name!r}")
            if transform == "transpose":
                arr = arr.T
            elif transform == "squeeze":
                arr = arr.reshape(-1)
            elif transform == "flatten_oc_transpose":
                arr = arr.reshape(arr.shape[0], -1).T
            merged = getattr(self, "_merged_slices", {})
            leaf_key = dest.split(".")[-1]
            if (
                dest.startswith("layers.")
                and layer_idx is not None
                and leaf_key in merged
            ):
                # projection was load-time fused; update its column slice
                mk, off, width = merged[leaf_key]
                leaf = params["layers"][mk]
                if not isinstance(leaf, jax.Array):
                    raise ValueError(
                        f"{name!r} targets a quantized fused stack; push "
                        "dense weights or reload from disk"
                    )
                val = jnp.asarray(np.ascontiguousarray(arr), dtype=leaf.dtype)
                params["layers"][mk] = leaf.at[
                    layer_idx, :, off : off + width
                ].set(val)
                n += 1
                continue
            leaf = _get_path(params, dest)
            if not isinstance(leaf, jax.Array):
                raise ValueError(
                    f"{name!r} targets a quantized stack; push dense "
                    "weights or reload from disk"
                )
            val = jnp.asarray(
                np.ascontiguousarray(arr), dtype=leaf.dtype
            )
            if layer_idx is not None:
                new = leaf.at[layer_idx].set(val)
            else:
                new = jax.device_put(val, leaf.sharding)
            _set_path(params, dest, new)
            n += 1
        return True, f"updated {n} tensors"

    def release_memory(self):
        """Drop the KV pool to free HBM (reference
        `release_memory_occupation`, RL colocation)."""
        self._kv_spec = jax.tree_util.tree_map(
            lambda x: (x.shape, x.dtype, x.sharding), self.kv_pool
        )
        self.kv_pool = None

    def resume_memory(self):
        self.kv_pool = jax.tree_util.tree_map(
            lambda spec: jax.device_put(
                jnp.zeros(spec[0], dtype=spec[1]), spec[2]
            ),
            self._kv_spec,
            is_leaf=lambda x: isinstance(x, tuple) and len(x) == 3,
        )
