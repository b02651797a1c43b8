"""Pallas paged MLA decode attention (TPU).

Latent-KV counterpart of `decode_kernel.py`, replacing the reference's
dedicated MLA decode kernels (`layers/attention/flashmla_backend.py:541`,
`cutlass_mla_backend.py`, Ascend MLA path in `ascend_backend.py`): the
absorbed MLA decode is MQA against ONE shared (R + rope)-wide latent key
per token (see `ops/mla_attention.py` for the absorption identities), so
the kernel streams (ckv, kpe) pages with double-buffered async DMA and
runs flash online-softmax for all H query heads at once.

vs the XLA path (`mla_attention_xla`): no [B, P_bucket, ps, R] gather
materialization — HBM traffic is exactly the LIVE latent bytes — and the
current token's latent is inserted in-kernel via read-modify-write DMA
with the pools aliased in place (an XLA scatter on a pallas-consumed pool
forces full-pool relayout copies; CLAUDE.md hard rule).

Layout: ckv [L, NP, ps, R], kpe [L, NP, ps, 128]; R % 128 == 0 (512 for
DeepSeek-V2/V3), rope dims zero-padded to one 128-lane tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _mla_decode_kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    page_tables_ref,  # [B, P] int32
    seq_lens_ref,  # [B] int32
    # inputs
    q_abs_ref,  # [1, H, R]   (pre-scaled)
    q_pe_ref,  # [1, H, 128] (pre-scaled, zero-padded past rope)
    new_ckv_ref,  # [1, 1, R]
    new_kpe_ref,  # [1, 1, 128]
    ckv_pool_ref,  # ANY [L, NP, ps, R]
    kpe_pool_ref,  # ANY [L, NP, ps, 128]
    # outputs
    o_ref,  # [1, H, R]
    ckv_out_ref,  # ANY (aliased)
    kpe_out_ref,  # ANY (aliased)
    # scratch
    ckv_buf,  # [4, np_blk, ps, R]
    kpe_buf,  # [4, np_blk, ps, 128]
    wc_buf,  # [ps, R]
    wp_buf,  # [ps, 128]
    acc_ref,  # [H, R] f32
    m_ref,  # [H, 128] f32
    l_ref,  # [H, 128] f32
    sems,  # DMA [4, 2, np_blk]
    wsems,  # DMA [2]
    *,
    page_size: int,
    block_t: int,
    scale: float,
    quantized: bool = False,
    qmax: float = 127.0,
):
    b = pl.program_id(0)
    layer = layer_ref[0]
    seq_len = seq_lens_ref[b]
    num_pages = pl.cdiv(seq_len, page_size)
    np_per_blk = block_t // page_size
    num_blocks = pl.cdiv(num_pages, np_per_blk)
    H, R = q_abs_ref.shape[1], q_abs_ref.shape[2]

    # ------------------------------------------------------------------
    # Phase 1: insert the current token's latent row (position seq_len-1)
    # via in-place read-modify-write of its page.
    # ------------------------------------------------------------------
    @pl.when(seq_len > 0)
    def _write_phase():
        pos = seq_len - 1
        page = page_tables_ref[b, pos // page_size]
        off = pos % page_size
        pltpu.make_async_copy(
            ckv_out_ref.at[layer, page], wc_buf, wsems.at[0]
        ).start()
        pltpu.make_async_copy(
            kpe_out_ref.at[layer, page], wp_buf, wsems.at[1]
        ).start()
        pltpu.make_async_copy(
            ckv_out_ref.at[layer, page], wc_buf, wsems.at[0]
        ).wait()
        pltpu.make_async_copy(
            kpe_out_ref.at[layer, page], wp_buf, wsems.at[1]
        ).wait()
        ps_ = wc_buf.shape[0]
        row_c = jax.lax.broadcasted_iota(jnp.int32, (ps_, R), 0) == off
        row_p = jax.lax.broadcasted_iota(jnp.int32, (ps_, 128), 0) == off
        kpe_row = new_kpe_ref[0]  # [1, 128]
        if quantized:
            # per-row scale: quantize the new latent row and stash its
            # dequant scale in the kpe pad lane (ops/mla_attention.py
            # module doc — no per-page grow-requantization needed)
            row32 = new_ckv_ref[0].astype(jnp.float32)  # [1, R]
            s_new = jnp.maximum(
                jnp.max(jnp.abs(row32), axis=-1, keepdims=True) / qmax, 1e-8
            )  # [1, 1]
            qrow = row32 / s_new
            if wc_buf.dtype == jnp.int8:
                qrow = jnp.clip(jnp.round(qrow), -127, 127)
            ckv_row = qrow.astype(wc_buf.dtype)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            kpe_row = jnp.where(
                lane == (128 - 1),
                jnp.broadcast_to(s_new, (1, 128)).astype(kpe_row.dtype),
                kpe_row,
            )
        else:
            ckv_row = new_ckv_ref[0].astype(wc_buf.dtype)
        wc_buf[...] = jnp.where(
            row_c, jnp.broadcast_to(ckv_row, (ps_, R)), wc_buf[...]
        )
        wp_buf[...] = jnp.where(
            row_p,
            jnp.broadcast_to(kpe_row.astype(wp_buf.dtype), (ps_, 128)),
            wp_buf[...],
        )
        pltpu.make_async_copy(
            wc_buf, ckv_out_ref.at[layer, page], wsems.at[0]
        ).start()
        pltpu.make_async_copy(
            wp_buf, kpe_out_ref.at[layer, page], wsems.at[1]
        ).start()
        pltpu.make_async_copy(
            wc_buf, ckv_out_ref.at[layer, page], wsems.at[0]
        ).wait()
        pltpu.make_async_copy(
            wp_buf, kpe_out_ref.at[layer, page], wsems.at[1]
        ).wait()

    # ------------------------------------------------------------------
    # Phase 2: flash attention over the paged latents.
    # ------------------------------------------------------------------
    def start_dma(blk, slot):
        for j in range(np_per_blk):
            page_pos = blk * np_per_blk + j

            @pl.when(page_pos < num_pages)
            def _():
                page = page_tables_ref[b, page_pos]
                pltpu.make_async_copy(
                    ckv_out_ref.at[layer, page],
                    ckv_buf.at[slot, j],
                    sems.at[slot, 0, j],
                ).start()
                pltpu.make_async_copy(
                    kpe_out_ref.at[layer, page],
                    kpe_buf.at[slot, j],
                    sems.at[slot, 1, j],
                ).start()

    def wait_dma(blk, slot):
        for j in range(np_per_blk):
            page_pos = blk * np_per_blk + j

            @pl.when(page_pos < num_pages)
            def _():
                page = page_tables_ref[b, page_pos]
                pltpu.make_async_copy(
                    ckv_out_ref.at[layer, page],
                    ckv_buf.at[slot, j],
                    sems.at[slot, 0, j],
                ).wait()
                pltpu.make_async_copy(
                    kpe_out_ref.at[layer, page],
                    kpe_buf.at[slot, j],
                    sems.at[slot, 1, j],
                ).wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    q_abs = q_abs_ref[0].astype(jnp.float32) * scale  # [H, R]
    q_pe = q_pe_ref[0].astype(jnp.float32) * scale  # [H, 128]

    NSLOT = 4
    for w in range(NSLOT - 1):
        @pl.when(w < num_blocks)
        def _(w=w):
            start_dma(w, w % NSLOT)

    def body(blk, _):
        slot = jax.lax.rem(blk, NSLOT)

        @pl.when(blk + (NSLOT - 1) < num_blocks)
        def _():
            start_dma(blk + (NSLOT - 1), jax.lax.rem(blk + (NSLOT - 1), NSLOT))

        wait_dma(blk, slot)

        ckv = ckv_buf[slot].reshape(block_t, R).astype(jnp.float32)
        kpe = kpe_buf[slot].reshape(block_t, 128).astype(jnp.float32)
        if quantized:
            # per-row dequant scale rides in the kpe pad lane; the q_pe
            # operand is zero there so the score dot never sees it
            lane = jax.lax.broadcasted_iota(jnp.int32, (block_t, 128), 1)
            srow = jnp.sum(
                jnp.where(lane == (128 - 1), kpe, 0.0),
                axis=-1, keepdims=True,
            )  # [T, 1]
            ckv = ckv * srow
        # build each mask in its target shape: cross-dim iota reshapes are
        # lane<->sublane relayouts Mosaic rejects (see decode_kernel.py)
        valid_row = (
            blk * block_t
            + jax.lax.broadcasted_iota(jnp.int32, (1, block_t), 1)
        ) < seq_len  # [1, T]
        valid_col = (
            blk * block_t
            + jax.lax.broadcasted_iota(jnp.int32, (block_t, 1), 0)
        ) < seq_len  # [T, 1]
        # scores [H, T]: q_abs.ckv + q_pe.kpe (kpe zero-padded past rope)
        s = jax.lax.dot_general(
            q_abs, ckv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s += jax.lax.dot_general(
            q_pe, kpe, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(valid_row, s, NEG_INF)
        # garbage latents in unwritten rows could be NaN/inf: zero them so
        # p=0 rows can't poison the pv matmul
        ckv = jnp.where(valid_col, ckv, 0.0)

        m_prev = m_ref[:, :1]  # [H, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [H, T]
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p, ckv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, R]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
        return 0

    jax.lax.fori_loop(0, num_blocks, body, 0)

    l = l_ref[:, :1]
    l = jnp.where(l <= 0.0, 1.0, l)
    o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("page_size", "scale", "interpret")
)
def mla_paged_decode_fused(
    q_abs: jax.Array,  # [B, H, R] absorbed nope queries
    q_pe: jax.Array,  # [B, H, rope]
    new_ckv: jax.Array,  # [B, R]
    new_kpe: jax.Array,  # [B, rope]
    pool,  # MLALatentPool
    layer_idx: jax.Array,
    page_tables: jax.Array,  # [B, P]
    seq_lens: jax.Array,  # [B] incl. current token
    page_size: int,
    scale: float,
    interpret: bool = False,
):
    """Fused latent-write + MLA decode attention.
    Returns (ctx [B, H, R], pool)."""
    from sglang_npu_tpu.ops.mla_attention import KPE_PAD, MLALatentPool

    B, H, R = q_abs.shape
    rope = q_pe.shape[-1]
    P = page_tables.shape[1]
    assert R % 128 == 0, R
    q_pe_p = jnp.pad(q_pe, ((0, 0), (0, 0), (0, KPE_PAD - rope)))
    new_kpe_p = jnp.pad(new_kpe, ((0, 0), (0, KPE_PAD - rope)))

    np_per_blk = min(max(256 // page_size, 1), P)
    block_t = np_per_blk * page_size
    dt = pool.ckv.dtype
    quantized = pool.quantized

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, R), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, KPE_PAD), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KPE_PAD), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, H, R), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, np_per_blk, page_size, R), dt),
            pltpu.VMEM((4, np_per_blk, page_size, KPE_PAD), pool.kpe.dtype),
            pltpu.VMEM((page_size, R), dt),
            pltpu.VMEM((page_size, KPE_PAD), pool.kpe.dtype),
            pltpu.VMEM((H, R), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2, np_per_blk)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out, ckv, kpe = pl.pallas_call(
        functools.partial(
            _mla_decode_kernel,
            page_size=page_size,
            block_t=block_t,
            scale=scale,
            quantized=quantized,
            qmax=pool.qmax,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, R), q_abs.dtype),
            jax.ShapeDtypeStruct(pool.ckv.shape, pool.ckv.dtype),
            jax.ShapeDtypeStruct(pool.kpe.shape, pool.kpe.dtype),
        ),
        input_output_aliases={7: 1, 8: 2},  # pools (after 3 prefetch + 4)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(
        jnp.asarray([layer_idx], dtype=jnp.int32).reshape(1),
        page_tables,
        seq_lens,
        q_abs,
        q_pe_p,
        new_ckv[:, None, :],
        new_kpe_p[:, None, :],
        pool.ckv,
        pool.kpe,
    )
    return out, MLALatentPool(ckv=ckv, kpe=kpe)
