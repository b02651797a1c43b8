"""Pallas paged decode attention kernel (TPU).

The centerpiece kernel replacing the reference's CUDA decode attention
(`sgl-kernel/csrc/attention/`, `layers/attention/flashattention_backend.py`
decode path, Ascend `_npu_paged_attention` in `ascend_backend.py`):
flash-style online-softmax attention of a single query token per sequence
against that sequence's paged KV, streamed page-by-page from HBM with
double-buffered async DMA.

Design:
  * grid = (B,): one program per sequence; all KV heads processed together
    so each page DMA moves [ps, D] x H_kv slabs (head-major pool layout).
  * **fused KV write**: the current token's K/V row is inserted into its
    page via read-modify-write DMA inside the kernel, with the pool
    aliased in-place (`input_output_aliases`).  This keeps the pool out of
    XLA scatter-land entirely — an XLA scatter picks a scatter-friendly
    layout and forces a full-pool relayout copy at every pallas call
    boundary (observed: 10GB copy per layer).
  * KV pages are gathered in blocks of BLOCK_T tokens (BLOCK_T/ps pages per
    block, DMA'd concurrently, 128-lane aligned compute).
  * online softmax in f32 scratch; GQA groups handled as a batched
    dot_general over the H_kv batch axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel_bbq(
    # scalar prefetch: layer [1], page_tables [B, P], seq_lens [B]
    layer_ref,
    page_tables_ref,
    seq_lens_ref,
    # inputs: q [BB,H,G,D], new_k/v [BB,H,D], gs [BB,2,H,Pp], pool, scale
    # outputs: o [BB,H,G,D], pool, scale
    # scratch: k_buf, v_buf, page_buf, acc, m, l, sems, wsems, wsbuf, snew
    *refs,
    page_size: int,
    block_t: int,
    bb: int,
    scale: float,
    sliding_window: int,
    logit_cap: float,
    quantized: bool = True,
    qmax: float = 127.0,
):
    """Decode with BB sequences per grid program (r5): the per-sequence
    fixed costs that dominate at batch 256 — write-phase DMA round-trip
    latency and the softmax/flash op soup on tiny [H, G, T] tensors —
    amortize across the group: RMW copies for all BB sequences fly
    together, and every vector op runs [BB, ...]-batched.  Quantized
    pools keep per-page scales positional (gs_ref) + logit-domain."""
    if quantized:
        (
            q_ref, new_k_ref, new_v_ref, gs_ref, pool_in_ref, scale_in_ref,
            o_ref, pool_ref, scale_ref,
            k_buf, v_buf, page_buf, acc_ref, m_ref, l_ref, sems, wsems,
            wsbuf, snew_ref,
        ) = refs
    else:
        (
            q_ref, new_k_ref, new_v_ref, pool_in_ref,
            o_ref, pool_ref,
            k_buf, v_buf, page_buf, acc_ref, m_ref, l_ref, sems, wsems,
        ) = refs
        gs_ref = scale_ref = wsbuf = snew_ref = None

    g0 = pl.program_id(0)
    layer = layer_ref[0]
    Hkv, G, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    np_per_blk = block_t // page_size

    def lane_select_b(slab, lane):
        """[BB, H, Pp] -> [BB, H, 1] at lane (same keepdims rule as
        lane_select)."""
        li = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 2)
        return jnp.sum(
            jnp.where(li == lane, slab, 0.0), axis=-1, keepdims=True
        )

    def to_q(x):
        if qmax >= 100.0 and page_buf.dtype == jnp.int8:
            return jnp.clip(jnp.round(x), -127, 127).astype(page_buf.dtype)
        return x.astype(page_buf.dtype)

    seq_lens = [seq_lens_ref[g0 * bb + i] for i in range(bb)]
    num_pages = [pl.cdiv(s, page_size) for s in seq_lens]
    last_pages = [
        page_tables_ref[g0 * bb + i, jnp.maximum(s - 1, 0) // page_size]
        for i, s in enumerate(seq_lens)
    ]

    # ---- Phase 1: batched RMW inserts (reads fly together) ----
    for i in range(bb):
        @pl.when(seq_lens[i] > 0)
        def _(i=i):
            page = last_pages[i]
            for kv in range(2):
                pltpu.make_async_copy(
                    pool_ref.at[layer, kv, :, page],
                    page_buf.at[i, kv],
                    wsems.at[i, kv],
                ).start()
                if quantized:
                    pltpu.make_async_copy(
                        scale_ref.at[layer, kv, page // 128],
                        wsbuf.at[i, kv],
                        wsems.at[i, 2 + kv],
                    ).start()
    for i in range(bb):
        @pl.when(seq_lens[i] > 0)
        def _(i=i):
            page = last_pages[i]
            for kv in range(2):
                pltpu.make_async_copy(
                    pool_ref.at[layer, kv, :, page],
                    page_buf.at[i, kv],
                    wsems.at[i, kv],
                ).wait()
                if quantized:
                    pltpu.make_async_copy(
                        scale_ref.at[layer, kv, page // 128],
                        wsbuf.at[i, kv],
                        wsems.at[i, 2 + kv],
                    ).wait()
            off = (seq_lens[i] - 1) % page_size
            ps_, D_ = page_buf.shape[3], page_buf.shape[4]
            row_idx = jax.lax.broadcasted_iota(jnp.int32, (Hkv, ps_, D_), 1)
            row_mask = row_idx == off
            if not quantized:
                for kv, new_ref in ((0, new_k_ref), (1, new_v_ref)):
                    ins = jnp.broadcast_to(
                        new_ref[i].astype(page_buf.dtype)[:, None, :],
                        (Hkv, ps_, D_),
                    )
                    page_buf[i, kv] = jnp.where(
                        row_mask, ins, page_buf[i, kv]
                    )
                for kv in range(2):
                    pltpu.make_async_copy(
                        page_buf.at[i, kv],
                        pool_ref.at[layer, kv, :, page],
                        wsems.at[i, kv],
                    ).start()
                return
            slane = jax.lax.rem(page, 128)
            for kv, new_ref in ((0, new_k_ref), (1, new_v_ref)):
                li = jax.lax.broadcasted_iota(jnp.int32, (Hkv, 128), 1)
                old_s = jnp.sum(
                    jnp.where(li == slane, wsbuf[i, kv], 0.0),
                    axis=-1, keepdims=True,
                )  # [H, 1]
                row = new_ref[i].astype(jnp.float32)  # [H, D]
                amax = jnp.max(jnp.abs(row), axis=-1, keepdims=True)
                s_new = jnp.maximum(jnp.maximum(old_s, amax / qmax), 1e-8)
                factor = jnp.where(old_s > 0, old_s / s_new, 0.0)
                pf = page_buf[i, kv].astype(jnp.float32) * factor[:, :, None]
                ins = jnp.broadcast_to(
                    (row / s_new)[:, None, :], (Hkv, ps_, D_)
                )
                page_buf[i, kv] = to_q(jnp.where(row_mask, ins, pf))
                wsbuf[i, kv] = jnp.where(
                    li == slane,
                    jnp.broadcast_to(s_new, (Hkv, 128)),
                    wsbuf[i, kv],
                )
                snew_ref[i, kv] = jnp.broadcast_to(s_new, (Hkv, 128))
            for kv in range(2):
                pltpu.make_async_copy(
                    page_buf.at[i, kv],
                    pool_ref.at[layer, kv, :, page],
                    wsems.at[i, kv],
                ).start()
                pltpu.make_async_copy(
                    wsbuf.at[i, kv],
                    scale_ref.at[layer, kv, page // 128],
                    wsems.at[i, 2 + kv],
                ).start()
    for i in range(bb):
        @pl.when(seq_lens[i] > 0)
        def _(i=i):
            page = last_pages[i]
            for kv in range(2):
                pltpu.make_async_copy(
                    page_buf.at[i, kv],
                    pool_ref.at[layer, kv, :, page],
                    wsems.at[i, kv],
                ).wait()
                if quantized:
                    pltpu.make_async_copy(
                        wsbuf.at[i, kv],
                        scale_ref.at[layer, kv, page // 128],
                        wsems.at[i, 2 + kv],
                    ).wait()

    # ---- Phase 2: batched flash over the group's pages ----
    max_pages = num_pages[0]
    for i in range(1, bb):
        max_pages = jnp.maximum(max_pages, num_pages[i])
    num_blocks = pl.cdiv(max_pages, np_per_blk)

    def start_dma(blk, slot):
        for i in range(bb):
            for j in range(np_per_blk):
                page_pos = blk * np_per_blk + j

                @pl.when(page_pos < num_pages[i])
                def _(i=i, j=j, page_pos=page_pos):
                    page = page_tables_ref[g0 * bb + i, page_pos]
                    pltpu.make_async_copy(
                        pool_ref.at[layer, 0, :, page],
                        k_buf.at[slot, i, :, j],
                        sems.at[slot, i, 0, j],
                    ).start()
                    pltpu.make_async_copy(
                        pool_ref.at[layer, 1, :, page],
                        v_buf.at[slot, i, :, j],
                        sems.at[slot, i, 1, j],
                    ).start()

    def wait_dma(blk, slot):
        for i in range(bb):
            for j in range(np_per_blk):
                page_pos = blk * np_per_blk + j

                @pl.when(page_pos < num_pages[i])
                def _(i=i, j=j, page_pos=page_pos):
                    page = page_tables_ref[g0 * bb + i, page_pos]
                    pltpu.make_async_copy(
                        pool_ref.at[layer, 0, :, page],
                        k_buf.at[slot, i, :, j],
                        sems.at[slot, i, 0, j],
                    ).wait()
                    pltpu.make_async_copy(
                        pool_ref.at[layer, 1, :, page],
                        v_buf.at[slot, i, :, j],
                        sems.at[slot, i, 1, j],
                    ).wait()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[...].astype(jnp.float32) * scale  # [BB, H, G, D]
    lens_vec = jnp.concatenate(
        [jnp.full((1, 1), s, jnp.int32) for s in seq_lens], axis=0
    )  # [BB, 1]
    npages_vec = jnp.concatenate(
        [jnp.full((1, 1), n, jnp.int32) for n in num_pages], axis=0
    )  # [BB, 1]

    NSLOT = 2
    start_dma(0, 0)

    def body(blk, _):
        slot = jax.lax.rem(blk, NSLOT)

        @pl.when(blk + 1 < num_blocks)
        def _():
            start_dma(blk + 1, jax.lax.rem(blk + 1, NSLOT))

        wait_dma(blk, slot)

        k = k_buf[slot].reshape(bb, Hkv, block_t, D).astype(jnp.float32)
        v = v_buf[slot].reshape(bb, Hkv, block_t, D).astype(jnp.float32)

        kvec = vvec = None
        if quantized:
            # positional per-page scales -> [BB, H, T] (logit domain)
            tdiv = (
                jax.lax.broadcasted_iota(jnp.int32, (bb, Hkv, block_t), 2)
                // page_size
            )
            kvec = jnp.zeros((bb, Hkv, block_t), jnp.float32)
            vvec = jnp.zeros((bb, Hkv, block_t), jnp.float32)
            for j in range(np_per_blk):
                page_pos = blk * np_per_blk + j
                is_last = (page_pos == (npages_vec - 1))[:, :, None]
                sk = jnp.where(
                    is_last, snew_ref[:, 0, :, :1],
                    lane_select_b(gs_ref[:, 0], page_pos),
                )  # [BB, H, 1]
                sv = jnp.where(
                    is_last, snew_ref[:, 1, :, :1],
                    lane_select_b(gs_ref[:, 1], page_pos),
                )
                kvec = jnp.where(tdiv == j, sk, kvec)
                vvec = jnp.where(tdiv == j, sv, vvec)

        valid_t = (
            blk * block_t
            + jax.lax.broadcasted_iota(jnp.int32, (bb, 1, block_t, 1), 2)
        ) < lens_vec[:, :, None, None]
        v = jnp.where(valid_t, v, 0.0)
        # Mosaic matmuls support ONE batch dim: merge (BB, H)
        qm = q.reshape(bb * Hkv, G, D)
        km = k.reshape(bb * Hkv, block_t, D)
        vm = v.reshape(bb * Hkv, block_t, D)
        s = jax.lax.dot_general(
            qm, km,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [BB*H, G, T]
        if quantized:
            s = s * kvec.reshape(bb * Hkv, 1, block_t)
        if logit_cap > 0:
            s = logit_cap * jnp.tanh(s / logit_cap)
        lens_m = jnp.broadcast_to(
            lens_vec[:, :, None, None], (bb, Hkv, 1, 1)
        ).reshape(bb * Hkv, 1, 1)
        tok_idx = blk * block_t + jax.lax.broadcasted_iota(
            jnp.int32, (bb * Hkv, G, block_t), 2
        )
        mask = tok_idx < lens_m
        if sliding_window > 0:
            mask = jnp.logical_and(
                mask, tok_idx > lens_m - 1 - sliding_window
            )
        s = jnp.where(mask, s, NEG_INF)

        mr = m_ref[...].reshape(bb * Hkv, G, 128)
        lr = l_ref[...].reshape(bb * Hkv, G, 128)
        m_prev = mr[:, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = lr[:, :, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p if vvec is None else p * vvec.reshape(bb * Hkv, 1, block_t),
            vm,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [BB*H, G, D]
        acc_ref[...] = (
            acc_ref[...].reshape(bb * Hkv, G, D) * alpha + pv
        ).reshape(bb, Hkv, G, D)
        m_ref[...] = jnp.broadcast_to(
            m_new, (bb * Hkv, G, 128)
        ).reshape(bb, Hkv, G, 128)
        l_ref[...] = jnp.broadcast_to(
            l_new, (bb * Hkv, G, 128)
        ).reshape(bb, Hkv, G, 128)
        return 0

    jax.lax.fori_loop(0, num_blocks, body, 0)

    l = l_ref[:, :, :, :1]
    l = jnp.where(l <= 0.0, 1.0, l)
    o_ref[...] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("page_size", "scale", "sliding_window", "logit_cap", "interpret"),
)
def paged_decode_attention_fused(
    q: jax.Array,  # [B, Hq, D]
    new_k: jax.Array,  # [B, Hkv, D]
    new_v: jax.Array,  # [B, Hkv, D]
    kv_pool: jax.Array,  # [L, 2, Hkv, NP_total, ps, D]
    layer_idx: jax.Array,  # scalar int32
    page_tables: jax.Array,  # [B, P] int32
    seq_lens: jax.Array,  # [B] int32 (incl. current token)
    page_size: int,
    scale: float,
    sliding_window: int = -1,
    logit_cap: float = 0.0,
    interpret: bool = False,
):
    """Fused write-KV + attention. Returns (out [B, Hq, D], kv_pool).

    ``kv_pool`` is either a plain [L, 2, Hkv, NP, ps, D] array or a
    `quant_kv.PagedQuantKV` (int8/fp8 data + per-(head, page) scales); the
    quantized path reads/writes both in place."""
    from sglang_npu_tpu.ops.pallas.quant_kv import PagedQuantKV

    quantized = isinstance(kv_pool, PagedQuantKV)
    pool_data = kv_pool.data if quantized else kv_pool
    B, Hq, D = q.shape
    Hkv = pool_data.shape[2]
    G = Hq // Hkv
    P = page_tables.shape[1]
    if D % 128 != 0 and not interpret:
        # Mosaic DMA slices must keep whole trailing (sublane, lane) tiles;
        # head_dim < 128 pools cannot be page-sliced. Callers fall back to
        # the XLA backend for such models (e.g. 1B-class with D=64).
        raise ValueError(f"pallas decode kernel requires head_dim % 128 == 0, got {D}")

    # block = up to 256 tokens of pages per flash iteration (deeper DMA
    # pipelining: many small page DMAs in flight per wait)
    np_per_blk = max(256 // page_size, 1)
    np_per_blk = min(np_per_blk, P)
    block_t = np_per_blk * page_size

    q4 = q.reshape(B, Hkv, G, D)
    nk4 = new_k.reshape(B, Hkv, 1, D)
    nv4 = new_v.reshape(B, Hkv, 1, D)

    # batched-program path: BB sequences per grid step (r5 — per-seq fixed
    # costs dominated at batch 256; see _decode_kernel_bbq)
    BB = 4
    Bp = -(-B // BB) * BB
    qb, nkb, nvb, pt, sl_ = q4, new_k, new_v, page_tables, seq_lens
    if Bp != B:
        qb = jnp.pad(q4, ((0, Bp - B), (0, 0), (0, 0), (0, 0)))
        nkb = jnp.pad(new_k, ((0, Bp - B), (0, 0), (0, 0)))
        nvb = jnp.pad(new_v, ((0, Bp - B), (0, 0), (0, 0)))
        pt = jnp.pad(page_tables, ((0, Bp - B), (0, 0)))
        sl_ = jnp.pad(seq_lens, (0, Bp - B))
    in_specs = [
        pl.BlockSpec(
            (BB, Hkv, G, D), lambda b, *_: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (BB, Hkv, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (BB, Hkv, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_specs = [
        pl.BlockSpec(
            (BB, Hkv, G, D), lambda b, *_: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Bp, Hkv, G, D), q.dtype),
        jax.ShapeDtypeStruct(pool_data.shape, pool_data.dtype),
    ]
    scratch = [
        pltpu.VMEM((2, BB, Hkv, np_per_blk, page_size, D), pool_data.dtype),
        pltpu.VMEM((2, BB, Hkv, np_per_blk, page_size, D), pool_data.dtype),
        pltpu.VMEM((BB, 2, Hkv, page_size, D), pool_data.dtype),
        pltpu.VMEM((BB, Hkv, G, D), jnp.float32),
        pltpu.VMEM((BB, Hkv, G, 128), jnp.float32),
        pltpu.VMEM((BB, Hkv, G, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((2, BB, 2, np_per_blk)),
        pltpu.SemaphoreType.DMA((BB, 4)),
    ]
    args = [
        jnp.asarray([layer_idx], dtype=jnp.int32).reshape(1),
        pt,
        sl_,
        qb,
        nkb,
        nvb,
    ]
    qmax = 127.0
    if quantized:
        sg, slx = pt // 128, pt % 128
        gathered = kv_pool.scale[layer_idx, :, sg, :, slx]  # [Bp, P, 2, H]
        gathered = jnp.transpose(gathered, (0, 2, 3, 1))  # [Bp, 2, H, P]
        Pp = -(-P // 128) * 128
        if Pp != P:
            gathered = jnp.pad(gathered, ((0, 0),) * 3 + ((0, Pp - P),))
        in_specs.append(
            pl.BlockSpec(
                (BB, 2, Hkv, Pp), lambda b, *_: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(gathered)
        qmax = kv_pool.qmax
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # pool
    args.append(pool_data)
    aliases = {(7 if quantized else 6): 1}
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # scale slabs
        args.append(kv_pool.scale)
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct(kv_pool.scale.shape, kv_pool.scale.dtype)
        )
        aliases[8] = 2
        scratch.extend(
            [
                pltpu.VMEM((BB, 2, Hkv, 128), jnp.float32),  # wsbuf
                pltpu.VMEM((BB, 2, Hkv, 128), jnp.float32),  # snew
            ]
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Bp // BB,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _decode_kernel_bbq,
        page_size=page_size,
        block_t=block_t,
        bb=BB,
        scale=scale,
        sliding_window=sliding_window,
        logit_cap=logit_cap,
        quantized=quantized,
        qmax=qmax,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(*args)
    if quantized:
        out, pool, spool = outs
        return (
            out[:B].reshape(B, Hq, D),
            PagedQuantKV(data=pool, scale=spool),
        )
    out, pool = outs
    return out[:B].reshape(B, Hq, D), pool


def paged_decode_attention(
    q: jax.Array,
    kv_pool: jax.Array,
    layer_idx: jax.Array,
    page_tables: jax.Array,
    seq_lens: jax.Array,
    page_size: int,
    scale: float,
    sliding_window: int = -1,
    logit_cap: float = 0.0,
    interpret: bool = False,
) -> jax.Array:
    """Attention-only variant (assumes the current token's KV is already in
    the pool): fuses a no-op write by passing the existing row."""
    B, Hq, D = q.shape
    Hkv = kv_pool.shape[2]
    # Re-read of the existing row: write the same values back.
    pos = jnp.maximum(seq_lens - 1, 0)
    page = jnp.take_along_axis(page_tables, (pos // page_size)[:, None], axis=1)[:, 0]
    off = pos % page_size
    cur_k = kv_pool[layer_idx, 0, :, page, off]  # [B, Hkv, D]
    cur_v = kv_pool[layer_idx, 1, :, page, off]
    out, _ = paged_decode_attention_fused(
        q,
        cur_k,
        cur_v,
        kv_pool,
        layer_idx,
        page_tables,
        seq_lens,
        page_size,
        scale,
        sliding_window,
        logit_cap,
        interpret,
    )
    return out
