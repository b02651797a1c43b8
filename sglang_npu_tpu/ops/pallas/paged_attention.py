"""Pallas paged attention backend (TPU).

Replaces the reference's CUDA attention backends
(`layers/attention/flashattention_backend.py`, `ascend_backend.py:642`) with
a TPU kernel family over the token-major paged KV pool.

Status: the decode kernel is implemented in `decode_kernel.py`; extend
(ragged prefill) currently falls back to the XLA path while the Pallas
ragged-prefill kernel lands.  `make_pallas_attention_backend()` returns a
callable with the model-facing signature
``(q, kv_l, fb, page_size, scale, config) -> out``.
"""

from __future__ import annotations

import jax

from sglang_npu_tpu.ops.xla_attention import paged_attention_xla


def make_pallas_attention_backend():
    def backend(q, k, v, kv_pool, layer_idx, fb, page_size, scale, config):
        B, E, Hq, D = q.shape
        sliding_window = config.sliding_window or -1
        if E == 1 and D % 128 == 0:
            from sglang_npu_tpu.ops.pallas.decode_kernel import (
                paged_decode_attention_fused,
            )

            out, kv_pool = paged_decode_attention_fused(
                q[:, 0],
                k[:, 0],
                v[:, 0],
                kv_pool,
                layer_idx,
                fb.page_tables,
                fb.seq_lens,
                page_size,
                scale,
                sliding_window=sliding_window,
                logit_cap=getattr(config, "logit_cap", 0.0) or 0.0,
            )
            return out[:, None], kv_pool
        if (
            E > 1
            and D % 128 == 0
            and fb.extend_prefix_lens is not None
            and E % min(128, E) == 0
            and min(128, E) % page_size == 0
        ):
            from sglang_npu_tpu.ops.pallas.prefill_kernel import (
                paged_prefill_attention_fused,
            )

            return paged_prefill_attention_fused(
                q,
                k,
                v,
                kv_pool,
                layer_idx,
                fb.page_tables,
                fb.seq_lens,
                fb.extend_prefix_lens,
                page_size,
                scale,
                sliding_window=sliding_window,
                logit_cap=getattr(config, "logit_cap", 0.0) or 0.0,
            )
        from sglang_npu_tpu.ops.xla_attention import write_kv

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
        return out, kv_pool

    return backend
