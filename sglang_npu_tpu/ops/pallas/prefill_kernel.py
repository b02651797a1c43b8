"""Pallas paged prefill (extend) attention kernel with fused KV write.

Replaces the reference's prefill attention kernels
(`layers/attention/flashattention_backend.py` extend path, triton
`extend_attention.py`, Ascend `_npu_flash_attention`) for the TPU engine:

  * writes the new tokens' K/V into their (request-exclusive) pool pages by
    whole-page DMA — the new-token region starts page-aligned (radix prefix
    reuse is page-aligned by construction) and the partial tail page is
    exclusively owned, so full-page writes need no read-modify-write;
  * then runs blockwise causal flash attention of the query block against
    all KV up to its position, streamed from the pool pages (prefix pages
    written by earlier requests' programs or the radix cache, own pages
    written by this / earlier blocks — the sequential TPU grid order makes
    the write-before-read dependency hold);
  * pool aliased in-place (`input_output_aliases`) — no XLA scatter, no
    pool relayout copies (see decode_kernel.py).

Grid: (B, num_q_blocks); query blocks of QB tokens.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _prefill_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    page_tables_ref,  # [B, P]
    seq_lens_ref,  # [B] (prefix + extend)
    prefix_lens_ref,  # [B] (page-aligned)
    # inputs: q, new_k, new_v, pool [, scale_pool]
    # outputs: o, pool [, scale_pool]
    # scratch: k_buf, v_buf, pbuf, acc, m, l, sems, wsems
    #          [, ssb, wsbuf, ssems]
    *refs,
    page_size: int,
    block_t: int,
    q_block: int,
    scale: float,
    sliding_window: int,
    logit_cap: float,
    quantized: bool = False,
    qmax: float = 127.0,
    write_only: bool = False,
):
    if quantized:
        (
            q_ref, new_k_ref, new_v_ref, pool_in_ref, scale_in_ref,
            o_ref, pool_ref, scale_ref,
            k_buf, v_buf, pbuf, acc_ref, m_ref, l_ref, sems, wsems,
            ssb, wsbuf, ssems,
        ) = refs
    else:
        (
            q_ref, new_k_ref, new_v_ref, pool_in_ref,
            o_ref, pool_ref,
            k_buf, v_buf, pbuf, acc_ref, m_ref, l_ref, sems, wsems,
        ) = refs
        scale_ref = ssb = wsbuf = ssems = None

    b = pl.program_id(0)
    qb = pl.program_id(1)
    layer = layer_ref[0]
    seq_len = seq_lens_ref[b]
    prefix_len = prefix_lens_ref[b]
    extend_len = seq_len - prefix_len

    Hkv = q_ref.shape[1]
    QB = q_ref.shape[2]
    G = q_ref.shape[3]
    D = q_ref.shape[4]
    np_per_blk = block_t // page_size
    npw = q_block // page_size  # pages written per q block

    q_start = qb * QB  # within the extend region
    block_active = q_start < extend_len

    def lane_select(slab, lane):
        # [H, 128] -> [H, 1] at `lane`; keepdims because rank-1 vectors
        # crash Mosaic layout inference (see decode_kernel.lane_select)
        li = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 1)
        return jnp.sum(jnp.where(li == lane, slab, 0.0), axis=-1, keepdims=True)

    def to_q(x):
        if quantized and pbuf.dtype == jnp.int8:
            return jnp.clip(jnp.round(x), -127, 127).astype(pbuf.dtype)
        return x.astype(pbuf.dtype)

    # ------------------------------------------------------------------
    # Phase 1: write this block's K/V into pool pages.  The region may
    # start mid-page (speculative verify; chunk boundaries): roll the
    # block so rows line up with the page grid, then read-modify-write
    # each touched page with a row-validity mask.
    # ------------------------------------------------------------------
    @pl.when(block_active)
    def _write():
        region_start = prefix_len + q_start  # global pos of block row 0
        region_end = jnp.minimum(region_start + QB, seq_len)
        off0 = jax.lax.rem(region_start, page_size)
        base_page = region_start // page_size
        # rolled[j*ps + r (mod QB)] = block[(j*ps + r - off0) mod QB]
        # (dynamic rotate only supports 32-bit data -> roll in f32)
        rolled_k = pltpu.roll(
            new_k_ref[0].astype(jnp.float32), off0, 1
        )
        rolled_v = pltpu.roll(
            new_v_ref[0].astype(jnp.float32), off0, 1
        )
        for j in range(npw + 1):
            page_pos = base_page + j
            p_start = page_pos * page_size

            @pl.when(
                jnp.logical_and(p_start < region_end,
                                p_start + page_size > region_start)
            )
            def _(j=j, page_pos=page_pos, p_start=p_start):
                page = page_tables_ref[b, page_pos]
                # read current page content (both k and v)
                for kv in range(2):
                    pltpu.make_async_copy(
                        pool_ref.at[layer, kv, :, page],
                        pbuf.at[kv],
                        wsems.at[kv, 0],
                    ).start()
                if quantized:
                    sgrp = page // 128
                    for kv in range(2):
                        pltpu.make_async_copy(
                            scale_ref.at[layer, kv, sgrp],
                            wsbuf.at[kv],
                            wsems.at[2 + kv, 0],
                        ).start()
                for kv in range(2):
                    pltpu.make_async_copy(
                        pool_ref.at[layer, kv, :, page],
                        pbuf.at[kv],
                        wsems.at[kv, 0],
                    ).wait()
                if quantized:
                    for kv in range(2):
                        pltpu.make_async_copy(
                            scale_ref.at[layer, kv, sgrp],
                            wsbuf.at[kv],
                            wsems.at[2 + kv, 0],
                        ).wait()
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (Hkv, page_size, D), 1
                )
                gpos = p_start + row
                valid = jnp.logical_and(gpos >= region_start, gpos < region_end)
                src_lo = (j * page_size) % QB
                sk = rolled_k[:, src_lo : src_lo + page_size, :]
                sv = rolled_v[:, src_lo : src_lo + page_size, :]
                if not quantized:
                    pbuf[0] = jnp.where(valid, sk.astype(pbuf.dtype), pbuf[0])
                    pbuf[1] = jnp.where(valid, sv.astype(pbuf.dtype), pbuf[1])
                else:
                    slane = jax.lax.rem(page, 128)
                    for kv, rows in ((0, sk), (1, sv)):
                        old_s = lane_select(wsbuf[kv], slane)  # [Hkv, 1]
                        amax = jnp.max(
                            jnp.max(
                                jnp.where(valid, jnp.abs(rows), 0.0), axis=2
                            ),
                            axis=1,
                            keepdims=True,
                        )  # [Hkv, 1]
                        s_new = jnp.maximum(
                            jnp.maximum(old_s, amax / qmax), 1e-8
                        )
                        factor = jnp.where(old_s > 0, old_s / s_new, 0.0)
                        pf = (
                            pbuf[kv].astype(jnp.float32)
                            * factor[:, :, None]
                        )
                        ins = rows / s_new[:, :, None]
                        pbuf[kv] = to_q(jnp.where(valid, ins, pf))
                        li = jax.lax.broadcasted_iota(
                            jnp.int32, wsbuf[kv].shape, 1
                        )
                        wsbuf[kv] = jnp.where(
                            li == slane,
                            jnp.broadcast_to(s_new, wsbuf[kv].shape),
                            wsbuf[kv],
                        )
                for kv in range(2):
                    pltpu.make_async_copy(
                        pbuf.at[kv],
                        pool_ref.at[layer, kv, :, page],
                        wsems.at[kv, 0],
                    ).start()
                if quantized:
                    for kv in range(2):
                        pltpu.make_async_copy(
                            wsbuf.at[kv],
                            scale_ref.at[layer, kv, sgrp],
                            wsems.at[2 + kv, 0],
                        ).start()
                for kv in range(2):
                    pltpu.make_async_copy(
                        pbuf.at[kv],
                        pool_ref.at[layer, kv, :, page],
                        wsems.at[kv, 0],
                    ).wait()
                if quantized:
                    for kv in range(2):
                        pltpu.make_async_copy(
                            wsbuf.at[kv],
                            scale_ref.at[layer, kv, sgrp],
                            wsems.at[2 + kv, 0],
                        ).wait()

    # ------------------------------------------------------------------
    # Phase 2: causal flash attention over pool pages [0, kv_end).
    # ------------------------------------------------------------------
    kv_end = jnp.minimum(prefix_len + q_start + QB, seq_len)
    num_pages = pl.cdiv(kv_end, page_size)
    num_blocks = pl.cdiv(num_pages, np_per_blk)

    def start_dma(blk, slot):
        for j in range(np_per_blk):
            page_pos = blk * np_per_blk + j

            @pl.when(page_pos < num_pages)
            def _():
                page = page_tables_ref[b, page_pos]
                pltpu.make_async_copy(
                    pool_ref.at[layer, 0, :, page],
                    k_buf.at[slot, :, j],
                    sems.at[slot, 0, j],
                ).start()
                pltpu.make_async_copy(
                    pool_ref.at[layer, 1, :, page],
                    v_buf.at[slot, :, j],
                    sems.at[slot, 1, j],
                ).start()
                if quantized:
                    for kv in range(2):
                        pltpu.make_async_copy(
                            scale_ref.at[layer, kv, page // 128],
                            ssb.at[slot, kv, j],
                            ssems.at[slot, kv, j],
                        ).start()

    def wait_dma(blk, slot):
        for j in range(np_per_blk):
            page_pos = blk * np_per_blk + j

            @pl.when(page_pos < num_pages)
            def _():
                page = page_tables_ref[b, page_pos]
                pltpu.make_async_copy(
                    pool_ref.at[layer, 0, :, page],
                    k_buf.at[slot, :, j],
                    sems.at[slot, 0, j],
                ).wait()
                pltpu.make_async_copy(
                    pool_ref.at[layer, 1, :, page],
                    v_buf.at[slot, :, j],
                    sems.at[slot, 1, j],
                ).wait()
                if quantized:
                    for kv in range(2):
                        pltpu.make_async_copy(
                            scale_ref.at[layer, kv, page // 128],
                            ssb.at[slot, kv, j],
                            ssems.at[slot, kv, j],
                        ).wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].reshape(Hkv, QB * G, D).astype(jnp.float32) * scale

    @pl.when(jnp.logical_and(block_active, not write_only))
    def _attend():
        start_dma(0, 0)

        def body(blk, _):
            slot = jax.lax.rem(blk, 2)
            next_slot = jax.lax.rem(blk + 1, 2)

            @pl.when(blk + 1 < num_blocks)
            def _():
                start_dma(blk + 1, next_slot)

            wait_dma(blk, slot)

            if not quantized:
                k = k_buf[slot].reshape(Hkv, block_t, D).astype(jnp.float32)
                v = v_buf[slot].reshape(Hkv, block_t, D).astype(jnp.float32)
            else:
                kparts, vparts = [], []
                for j in range(np_per_blk):
                    page = page_tables_ref[
                        b, jnp.minimum(blk * np_per_blk + j, num_pages - 1)
                    ]
                    slane = jax.lax.rem(page, 128)
                    ks = lane_select(ssb[slot, 0, j], slane)  # [Hkv, 1]
                    vs = lane_select(ssb[slot, 1, j], slane)
                    kparts.append(
                        k_buf[slot][:, j].astype(jnp.float32)
                        * ks[:, :, None]
                    )
                    vparts.append(
                        v_buf[slot][:, j].astype(jnp.float32)
                        * vs[:, :, None]
                    )
                k = jnp.concatenate(kparts, axis=1)
                v = jnp.concatenate(vparts, axis=1)
            valid_t = (
                blk * block_t
                + jax.lax.broadcasted_iota(jnp.int32, (1, block_t, 1), 1)
            ) < kv_end
            v = jnp.where(valid_t, v, 0.0)

            s = jax.lax.dot_general(
                q,
                k,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [Hkv, QB*G, T]
            if logit_cap > 0:
                s = logit_cap * jnp.tanh(s / logit_cap)

            # causal mask: q position = prefix + q_start + qi
            qi = jax.lax.broadcasted_iota(
                jnp.int32, (Hkv, QB * G, block_t), 1
            ) // G
            q_pos = prefix_len + q_start + qi
            kv_pos = blk * block_t + jax.lax.broadcasted_iota(
                jnp.int32, (Hkv, QB * G, block_t), 2
            )
            mask = (kv_pos <= q_pos) & (kv_pos < seq_len)
            if sliding_window > 0:
                mask = jnp.logical_and(mask, kv_pos > q_pos - sliding_window)
            s = jnp.where(mask, s, NEG_INF)

            m_prev = m_ref[:, :, :1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_ref[:, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p,
                v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc_ref[...] = acc_ref[...] * alpha + pv
            m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
            return 0

        jax.lax.fori_loop(0, num_blocks, body, 0)

    l = l_ref[:, :, :1]
    l = jnp.where(l <= 0.0, 1.0, l)
    o_ref[0] = (
        (acc_ref[...] / l).reshape(Hkv, QB, G, D).astype(o_ref.dtype)
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size",
        "scale",
        "sliding_window",
        "logit_cap",
        "interpret",
        "write_only",
    ),
)
def paged_prefill_attention_fused(
    q: jax.Array,  # [B, E, Hq, D]
    new_k: jax.Array,  # [B, E, Hkv, D]
    new_v: jax.Array,  # [B, E, Hkv, D]
    kv_pool: jax.Array,  # [L, 2, Hkv, NP_total, ps, D]
    layer_idx: jax.Array,
    page_tables: jax.Array,  # [B, P]
    seq_lens: jax.Array,  # [B]
    prefix_lens: jax.Array,  # [B] page-aligned
    page_size: int,
    scale: float,
    sliding_window: int = -1,
    logit_cap: float = 0.0,
    interpret: bool = False,
    write_only: bool = False,
):
    """Fused extend write + causal attention. Returns (out, kv_pool).

    ``kv_pool`` may be a plain array or a `quant_kv.PagedQuantKV`.
    ``write_only`` skips the attention phase (speculative-commit path:
    write accepted rows computed during tree verify)."""
    from sglang_npu_tpu.ops.pallas.quant_kv import PagedQuantKV

    quantized = isinstance(kv_pool, PagedQuantKV)
    pool_data = kv_pool.data if quantized else kv_pool
    B, E, Hq, D = q.shape
    Hkv = pool_data.shape[2]
    G = Hq // Hkv
    P = page_tables.shape[1]
    if D % 128 != 0 and not interpret:
        raise ValueError(f"pallas prefill kernel requires head_dim % 128 == 0, got {D}")
    QB = min(128, E)
    if E % QB != 0 or QB % page_size != 0:
        raise ValueError(f"E={E} must be a multiple of QB={QB} and QB of page_size")
    nqb = E // QB
    np_per_blk = max(min(128 // page_size, P), 1)
    block_t = np_per_blk * page_size

    # head-major activations for straight DMA / batched dot
    q5 = q.reshape(B, E, Hkv, G, D).transpose(0, 2, 1, 3, 4)  # [B, Hkv, E, G, D]
    k4 = new_k.transpose(0, 2, 1, 3)  # [B, Hkv, E, D]
    v4 = new_v.transpose(0, 2, 1, 3)

    in_specs = [
        pl.BlockSpec(
            (1, Hkv, QB, G, D),
            lambda b, qb, *_: (b, 0, qb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, Hkv, QB, D),
            lambda b, qb, *_: (b, 0, qb, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, Hkv, QB, D),
            lambda b, qb, *_: (b, 0, qb, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_specs = [
        pl.BlockSpec(
            (1, Hkv, QB, G, D),
            lambda b, qb, *_: (b, 0, qb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, Hkv, E, G, D), q.dtype),
        jax.ShapeDtypeStruct(pool_data.shape, pool_data.dtype),
    ]
    scratch = [
        pltpu.VMEM((2, Hkv, np_per_blk, page_size, D), pool_data.dtype),
        pltpu.VMEM((2, Hkv, np_per_blk, page_size, D), pool_data.dtype),
        pltpu.VMEM((2, Hkv, page_size, D), pool_data.dtype),
        pltpu.VMEM((Hkv, QB * G, D), jnp.float32),
        pltpu.VMEM((Hkv, QB * G, 128), jnp.float32),
        pltpu.VMEM((Hkv, QB * G, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 2, np_per_blk)),
        pltpu.SemaphoreType.DMA((4, 1)),
    ]
    args = [
        jnp.asarray([layer_idx], dtype=jnp.int32).reshape(1),
        page_tables,
        seq_lens,
        prefix_lens,
        q5,
        k4,
        v4,
        pool_data,
    ]
    aliases = {7: 1}  # 4 scalar prefetch + q, k, v -> pool
    qmax = 127.0
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct(kv_pool.scale.shape, kv_pool.scale.dtype)
        )
        scratch.extend(
            [
                pltpu.VMEM((2, 2, np_per_blk, Hkv, 128), jnp.float32),
                pltpu.VMEM((2, Hkv, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2, np_per_blk)),
            ]
        )
        args.append(kv_pool.scale)
        aliases[8] = 2
        qmax = kv_pool.qmax

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, nqb),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )

    kernel = functools.partial(
        _prefill_kernel,
        page_size=page_size,
        block_t=block_t,
        q_block=QB,
        scale=scale,
        sliding_window=sliding_window,
        logit_cap=logit_cap,
        quantized=quantized,
        qmax=qmax,
        write_only=write_only,
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(*args)
    if quantized:
        out, pool, spool = outs
        kv_out = PagedQuantKV(data=pool, scale=spool)
    else:
        out, pool = outs
        kv_out = pool
    out = out.transpose(0, 2, 1, 3, 4).reshape(B, E, Hq, D)
    return out, kv_out
