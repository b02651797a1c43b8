"""Pallas paged attention backend (TPU).

Replaces the reference's CUDA attention backends
(`layers/attention/flashattention_backend.py`, `ascend_backend.py:642`) with
the TPU kernel family over the paged KV pool, including the KV writes
(fused in-kernel with `input_output_aliases` — see decode_kernel.py for why
XLA scatter must not touch the pool).

Under tensor parallelism the kernels are wrapped in `shard_map` over the
"model" mesh axis: each shard runs the kernel on its local KV heads (the
reference's per-rank attention, without processes).

`SGLANG_TPU_PALLAS_INTERPRET=1` forces interpreter mode (CPU tests).
"""

from __future__ import annotations

import os

import jax
from jax.sharding import PartitionSpec as P

from sglang_npu_tpu.ops.xla_attention import paged_attention_xla, write_kv


def _interpret() -> bool:
    return os.environ.get("SGLANG_TPU_PALLAS_INTERPRET", "0") == "1"


def _shard_mesh(mesh):
    """Mesh for the kernel shard_map: inside an outer manual region (PP's
    GPipe shard_map) the inner partial-manual shard_map must receive the
    CONTEXT AbstractMesh (whose 'pipe' axis is already Manual), not the
    concrete mesh."""
    try:
        cur = jax.sharding.get_abstract_mesh()
        if cur is not None and not cur.empty:
            return cur
    except Exception:
        pass
    return mesh


def make_pallas_attention_backend(mesh=None):
    from sglang_npu_tpu.parallel.mesh import MODEL_AXIS

    tp = mesh.shape[MODEL_AXIS] if mesh is not None else 1

    def backend(q, k, v, kv_pool, layer_idx, fb, page_size, scale, config):
        import jax.numpy as jnp

        B, E, Hq, D = q.shape
        sliding_window = config.sliding_window or -1
        logit_cap = getattr(config, "logit_cap", 0.0) or 0.0
        from sglang_npu_tpu.ops.pallas.quant_kv import PagedQuantKV
        from sglang_npu_tpu.ops.xla_attention import QuantKVPool

        interp = _interpret()
        is_quant = isinstance(kv_pool, PagedQuantKV)
        pool_data = kv_pool.data if is_quant else kv_pool
        Dp = pool_data.shape[-1] if not isinstance(kv_pool, QuantKVPool) else D
        true_D = D
        if Dp != D:
            # D<128 model on a lane-padded pool (model_runner.kv_head_dim):
            # zero-pad q/k/v — padded K lanes are zero so scores are exact,
            # padded V lanes are zero so the output pad slices off clean.
            pad = [(0, 0)] * (q.ndim - 1) + [(0, Dp - D)]
            q = jnp.pad(q, pad)
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
            D = Dp
        kernel_ok = ((D % 128 == 0) or interp) and not isinstance(
            kv_pool, QuantKVPool
        )
        pool_specs = P(None, None, MODEL_AXIS, None, None, None)
        if is_quant:
            # pytree of specs matching the PagedQuantKV structure
            pool_specs = PagedQuantKV(
                data=P(None, None, MODEL_AXIS, None, None, None),
                scale=P(None, None, None, MODEL_AXIS, None),
            )

        if E == 1 and kernel_ok:
            from sglang_npu_tpu.ops.pallas.decode_kernel import (
                paged_decode_attention_fused,
            )

            def call(q_, k_, v_, pool_, pt_, seq_, li_):
                return paged_decode_attention_fused(
                    q_, k_, v_, pool_, li_, pt_, seq_,
                    page_size, scale,
                    sliding_window=sliding_window,
                    logit_cap=logit_cap,
                    interpret=interp,
                )

            if tp > 1:
                call = jax.shard_map(
                    call,
                    mesh=_shard_mesh(mesh),
                    in_specs=(
                        P(None, MODEL_AXIS, None),
                        P(None, MODEL_AXIS, None),
                        P(None, MODEL_AXIS, None),
                        pool_specs,
                        P(None, None),
                        P(None),
                        P(),
                    ),
                    out_specs=(
                        P(None, MODEL_AXIS, None),
                        pool_specs,
                    ),
                    axis_names={MODEL_AXIS},
                    check_vma=False,
                )
            out, kv_pool = call(
                q[:, 0], k[:, 0], v[:, 0], kv_pool,
                fb.page_tables, fb.seq_lens, layer_idx,
            )
            return out[:, None, :, :true_D], kv_pool

        if (
            E > 1
            and kernel_ok
            and fb.extend_prefix_lens is not None
            and E % min(128, E) == 0
            and min(128, E) % page_size == 0
        ):
            from sglang_npu_tpu.ops.pallas.prefill_kernel import (
                paged_prefill_attention_fused,
            )

            def pcall(q_, k_, v_, pool_, pt_, seq_, pre_, li_):
                return paged_prefill_attention_fused(
                    q_, k_, v_, pool_, li_, pt_, seq_, pre_,
                    page_size, scale,
                    sliding_window=sliding_window,
                    logit_cap=logit_cap,
                    interpret=interp,
                )

            if tp > 1:
                pcall = jax.shard_map(
                    pcall,
                    mesh=_shard_mesh(mesh),
                    in_specs=(
                        P(None, None, MODEL_AXIS, None),
                        P(None, None, MODEL_AXIS, None),
                        P(None, None, MODEL_AXIS, None),
                        pool_specs,
                        P(None, None),
                        P(None),
                        P(None),
                        P(),
                    ),
                    out_specs=(
                        P(None, None, MODEL_AXIS, None),
                        pool_specs,
                    ),
                    axis_names={MODEL_AXIS},
                    check_vma=False,
                )
            out, kv_pool = pcall(
                q, k, v, kv_pool,
                fb.page_tables, fb.seq_lens, fb.extend_prefix_lens, layer_idx,
            )
            return out[..., :true_D], kv_pool

        if is_quant:
            # the XLA fallback cannot touch a pallas quant pool (scatter
            # would force a full-pool relayout); shapes outside kernel
            # support must never be scheduled with this pool type
            raise ValueError(
                f"pallas quantized KV pool has no fallback path for this "
                f"batch shape (E={E}, D={D})"
            )
        kv_pool = write_kv(kv_pool, layer_idx, k, v, fb.out_slots)
        out = paged_attention_xla(
            q,
            kv_pool,
            layer_idx,
            fb.page_tables,
            fb.seq_lens,
            fb.positions,
            page_size,
            scale,
            sliding_window=sliding_window,
        )
        return out[..., :true_D], kv_pool

    return backend
