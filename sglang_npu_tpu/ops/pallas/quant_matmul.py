"""Pallas W4 grouped dequant-matmuls (TPU).

TPU counterpart of the reference's AWQ/GPTQ dequant GEMM kernels
(`sgl-kernel/csrc/gemm/awq_kernel.cu`, `layers/quantization/awq_triton.py`):
weights stream from HBM as packed 4-bit nibbles so HBM weight traffic is
~K*N/2 bytes — a 4x cut vs bf16, which directly bounds decode latency
(decode GEMV is weight-bandwidth-bound).

Layout contract (see `layers.quantization.pack_w4`): byte j of group G is
    lo_nibble = q4[G*g + j]            (unsigned, 0..15)
    hi_nibble = q4[G*g + j + g/2] ^ 8  (xor8 storage)
so, bitcast to SIGNED int8,
    byte & 0x0F == q_lo               exactly
    byte & 0xF0 == 16 * (q_hi - 8)    exactly
— both planes extract with one int8 mask each (Mosaic supports neither
8-bit shifts nor uint8->float casts).  The -8 offset and the /16 fold
into the zero-point term and the group scale respectively.

Round-4 redesign (probes 7-10, `scripts/bench_w4_probe*.py`):
  * All kernels take the NATURAL activation block [BM, BK] — the nibble
    planes are per-group static lane slices inside the kernel, and the
    int8 paths quantize activations in-kernel (per-token scale is one
    tiny XLA reduce).  The round-3 XLA-side plane-split/stack prep
    (strided copies per call) is gone.
  * The zero-point correction stays an XLA epilogue for ALL kernels:
    in-kernel fusion measured slower for bf16/int8x2 (the b-stream +
    extra dots cost more than the saved [M, N] pass) and the a8 variant's
    narrow [BM, BK/g] operand blocks are illegal lane tilings on real
    hardware for K/g not a multiple of the block (w_down K=14336).
  * int8 paths exploit dhi = 16*(x . (q_hi-8)) being EXACTLY divisible
    by 16: `dhi >> 4` replaces a f32 convert+multiply per plane, and the
    a16x2 combine (d1 << 7) + d2 is exact in i32 (|d1| < 2^18).  Probe9:
    568 GB/s for the a8 kernel core at the [64, 4096, 14336] decode
    shape (DMA floor 864).
  * Dead ends measured so far, do not re-try blindly: s4/int4 Refs and
    bitcasts (Mosaic "changing bitwidths not supported" + broken jit arg
    path), int8 dots with preferred_element_type=f32 (compiler crash),
    batched dot_general over the group dim (compiler crash).

Kernel roles (probe10, production entry points at [*, 4096, 14336]):
  * matmul_w4     — bf16 MXU, per-weight-element-bound: ~290 GB/s at
                    M=64, ~210 at M=128 (MXU time adds in), M-amortizing.
                    One-bf16-pass precision = the reference AWQ
                    dequant-GEMM class.  DEFAULT for W4A16.
  * matmul_w4a8   — per-token int8 activations on the int8 MXU; ~480
                    GB/s at M<=64 but per-[M,N]-unit-bound (cost scales
                    with M): the small-batch latency king.
  * matmul_w4a16x2— A16-class on the int8 MXU via exact two-component
                    residual decomposition x = sx*(q1 + q2/128)
                    (precision >= one bf16 pass, ~264 GB/s at M=64);
                    opt-in via --w4-mxu-precision int8x2.

Zero-point convention: dequant w = q*s - b.  All kernels compute
    x_lo @ (q_lo * s)  +  x_hi @ ((q_hi - 8) * s)
      + 8 * (xsum_hi @ s) - xsum @ b
where the per-group activation sums come from the REAL activations (for
a8/x2, pre-scaled to ride the kernels' sx output epilogue).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w4_matmul_kernel(
    x_ref,  # [BM, BK] bf16 — natural activation block
    qw_ref,  # [BK//2, BN] uint8
    s_ref,  # [BK//g, BN] f32
    o_ref,  # [BM, BN] out dtype
    acc_ref,  # [BM, BN] f32 scratch
    xlo_ref,  # [BM, BK//2] bf16 scratch — gathered lo-plane activations
    xhi_ref,  # [BM, BK//2] bf16 scratch
    *,
    group_size: int,
    out_dtype,
    stacked: bool = False,
):
    """Exact A16 path: int8-domain masks + direct int8->bf16 converts +
    full-depth bf16 dots.  Per-weight-element VPU cost (mask, convert,
    scale-mul) is independent of M — this is the path that amortizes with
    batch.  ``stacked``: operands carry a leading layer-block dim of 1
    (stacked-layer variant, see _call_w4_kernel_stacked)."""
    if stacked:
        qw_ref = qw_ref.at[0]
        s_ref = s_ref.at[0]
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    BKh, BN = qw_ref.shape
    g = group_size
    gh = g // 2
    G_blk = (2 * BKh) // g
    # shuffle in-group halves into contiguous planes (cost ~ |x| moves,
    # negligible next to the per-weight-element work)
    for G in range(G_blk):
        xlo_ref[:, G * gh : (G + 1) * gh] = x_ref[:, G * g : G * g + gh]
        xhi_ref[:, G * gh : (G + 1) * gh] = x_ref[:, G * g + gh : (G + 1) * g]
    p8 = jax.lax.bitcast_convert_type(qw_ref[...], jnp.int8)
    lo_bf = (p8 & jnp.int8(0x0F)).astype(jnp.bfloat16)  # q_lo
    hi_bf = (p8 & jnp.int8(-16)).astype(jnp.bfloat16)  # 16*(q_hi-8)
    sb = s_ref[...].astype(jnp.bfloat16).reshape(G_blk, 1, BN)
    sh = (s_ref[...] * (1.0 / 16.0)).astype(jnp.bfloat16).reshape(G_blk, 1, BN)
    wlo = (lo_bf.reshape(G_blk, gh, BN) * sb).reshape(BKh, BN)
    whi = (hi_bf.reshape(G_blk, gh, BN) * sh).reshape(BKh, BN)
    acc = jnp.dot(xlo_ref[...], wlo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xhi_ref[...], whi, preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _w4a8_matmul_kernel(
    x_ref,  # [BM, BK] bf16 — natural activation block
    qw_ref,  # [BK//2, BN] uint8
    s_ref,  # [BK//g, BN] f32
    sx_ref,  # [BM, 128] f32 — per-token activation scale (col 0)
    o_ref,  # [BM, BN] out dtype
    acc_ref,  # [BM, BN] f32 scratch
    *,
    group_size: int,
    out_dtype,
    stacked: bool = False,
):
    """W4A8: in-kernel per-token int8 activation quant; the int8 MXU
    consumes the RAW masked weight bytes (per-weight VPU work = two int8
    masks) and the hi plane's /16 is an exact arithmetic shift on the
    int32 partial dots."""
    if stacked:
        qw_ref = qw_ref.at[0]
        s_ref = s_ref.at[0]
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    BKh, BN = qw_ref.shape
    g = group_size
    gh = g // 2
    G_blk = (2 * BKh) // g
    p8 = jax.lax.bitcast_convert_type(qw_ref[...], jnp.int8)
    lo8 = p8 & jnp.int8(0x0F)
    hi8 = p8 & jnp.int8(-16)
    inv = 1.0 / sx_ref[:, :1]  # [BM, 1]
    xq = jnp.clip(
        jnp.round(x_ref[...].astype(jnp.float32) * inv), -127, 127
    ).astype(jnp.int8)
    a = jnp.zeros_like(acc_ref)
    for G in range(G_blk):
        c0 = G * g
        r0, r1 = G * gh, (G + 1) * gh
        dlo = jnp.dot(
            xq[:, c0 : c0 + gh], lo8[r0:r1], preferred_element_type=jnp.int32
        )
        dhi = jnp.dot(
            xq[:, c0 + gh : c0 + g], hi8[r0:r1],
            preferred_element_type=jnp.int32,
        )
        d = dlo + jax.lax.shift_right_arithmetic(dhi, 4)  # exact: 16 | dhi
        a += d.astype(jnp.float32) * s_ref[G, :][None, :]
    acc_ref[...] += a

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] * sx_ref[:, :1]).astype(out_dtype)


def _w4a16x2_matmul_kernel(
    x_ref,  # [BM, BK] bf16 — natural activation block
    qw_ref,  # [BK//2, BN] uint8
    s_ref,  # [BK//g, BN] f32
    sx_ref,  # [BM, 128] f32 — per-token coarse scale (col 0)
    o_ref,  # [BM, BN] out dtype
    acc_ref,  # [BM, BN] f32 scratch
    xq_ref,  # [2, BM, BK] int8 scratch — [coarse; residual] components
    *,
    group_size: int,
    out_dtype,
):
    """Exact-class A16 on the int8 MXU: x = sx*(q1 + q2/128) in-kernel
    (two int8 components, ~15 mantissa bits — more precise than one bf16
    MXU pass); both components ride the SAME dots as extra M rows and the
    component/plane combines are exact int32 shifts."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    BKh, BN = qw_ref.shape
    BM = acc_ref.shape[0]
    g = group_size
    gh = g // 2
    G_blk = (2 * BKh) // g
    p8 = jax.lax.bitcast_convert_type(qw_ref[...], jnp.int8)
    lo8 = p8 & jnp.int8(0x0F)
    hi8 = p8 & jnp.int8(-16)
    inv = 1.0 / sx_ref[:, :1]
    z = x_ref[...].astype(jnp.float32) * inv
    q1 = jnp.clip(jnp.round(z), -127, 127)
    q2 = jnp.clip(jnp.round((z - q1) * 128.0), -127, 127)
    xq_ref[0] = q1.astype(jnp.int8)
    xq_ref[1] = q2.astype(jnp.int8)
    a = jnp.zeros_like(acc_ref)
    for G in range(G_blk):
        c0 = G * g
        r0, r1 = G * gh, (G + 1) * gh
        xlo = xq_ref[:, :, c0 : c0 + gh].reshape(2 * BM, gh)
        xhi = xq_ref[:, :, c0 + gh : c0 + g].reshape(2 * BM, gh)
        dlo = jnp.dot(xlo, lo8[r0:r1], preferred_element_type=jnp.int32)
        dhi = jnp.dot(xhi, hi8[r0:r1], preferred_element_type=jnp.int32)
        d = dlo + jax.lax.shift_right_arithmetic(dhi, 4)  # [2BM, BN] exact
        D = jax.lax.shift_left(d[:BM], 7) + d[BM:]  # exact, |d1| < 2^18
        a += D.astype(jnp.float32) * s_ref[G, :][None, :]
    acc_ref[...] += a

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (
            acc_ref[...] * (sx_ref[:, :1] * (1.0 / 128.0))
        ).astype(out_dtype)


def _pick_block(total: int, unit: int, cap: int) -> int:
    """Largest multiple of `unit` dividing `total`, at most `cap`."""
    best = unit
    m = unit
    while m <= cap:
        if total % m == 0:
            best = m
        m *= 2
    return best


def _plan(M: int, K: int, N: int, g: int):
    # Tile M: chunked-prefill extends feed thousands of rows.  Large BM
    # matters for matmul_w4 — its per-weight-element dequant re-runs per
    # M-block, so fewer blocks = less VPU.  Prefill-class M (>= 1024)
    # trades BK down for BM 2048: 2 dequant passes per weight at the 4096-
    # token chunk instead of 8 (VERDICT r4 item 2 — W4 prefill should run
    # within ~15% of the one-dequant-per-weight floor).
    if M >= 1024:
        BK = _pick_block(K, g, 2048)
        BN = _pick_block(N, 128, 512)
        BM = 2048
    else:
        BK = _pick_block(K, g, 4096)
        BN = _pick_block(N, 128, 1024)
        BM = 512 if M > 256 else max(-(-M // 16) * 16, 16)
    Mp = -(-M // BM) * BM
    return BK, BN, BM, Mp


def _zp_correction(x32, s, b, g: int):
    """XLA-side  8*(xsum_hi @ s) - xsum @ b  epilogue (used by the bf16 and
    int8x2 kernels — in-kernel fusion measured SLOWER for them, probe10:
    the b-stream + extra dots exceed the saved [M, N] pass; the a8 kernel
    keeps the fused version, where it wins)."""
    xh8, xs = _group_sums(x32, g)
    return xh8 @ s - xs @ b


def _group_sums(x32, g: int):
    """(8*hi-half sums, full sums) per group — the zero-point operands;
    x32 [Mp, K] f32 -> two [Mp, K//g] f32."""
    Mp, K = x32.shape
    xg = x32.reshape(Mp, K // g, g)
    xsum = jnp.sum(xg, axis=2)
    xsum_hi8 = 8.0 * jnp.sum(xg[:, :, g // 2 :], axis=2)
    return xsum_hi8, xsum


def _sx_tile(x32, Mp: int):
    sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=1, keepdims=True), 1e-9) / 127.0
    return sx, jnp.broadcast_to(sx, (Mp, 128))


def _call_w4_kernel(kernel, x, qw, s, b, zp, extra, M, K, N, g, interpret,
                    scratch):
    del b, zp  # all kernels use the XLA-side zero-point epilogue
    BK, BN, BM, Mp = _plan(M, K, N, g)
    if x.shape[0] != Mp:
        x = jnp.pad(x, ((0, Mp - x.shape[0]), (0, 0)))
    in_specs = [
        pl.BlockSpec((BM, BK), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (BK // 2, BN), lambda m, n, k: (k, n), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (BK // g, BN), lambda m, n, k: (k, n), memory_space=pltpu.VMEM
        ),
    ]
    args = [x, qw, s]
    for e in extra:  # sx tile [Mp, 128]
        in_specs.append(
            pl.BlockSpec((BM, 128), lambda m, n, k: (m, 0), memory_space=pltpu.VMEM)
        )
        args.append(e)
    out = pl.pallas_call(
        functools.partial(kernel, group_size=g, out_dtype=x.dtype),
        grid=(Mp // BM, N // BN, K // BK),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (BM, BN), lambda m, n, k: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)] + scratch(BM, BK),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out[:M]


@functools.partial(jax.jit, static_argnames=("group_size", "interpret"))
def matmul_w4(
    x: jax.Array,  # [M, K]
    qw: jax.Array,  # [K//2, N] uint8
    s: jax.Array,  # [K//g, N] f32
    b: jax.Array,  # [K//g, N] f32
    group_size: int = 128,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    N = qw.shape[1]
    g = group_size
    BK, BN, BM, Mp = _plan(M, K, N, g)
    x32 = x.astype(jnp.float32)
    if Mp != M:
        x32 = jnp.pad(x32, ((0, Mp - M), (0, 0)))
    out = _call_w4_kernel(
        _w4_matmul_kernel, x32.astype(jnp.bfloat16), qw, s, None,
        (), (), M, K, N, g, interpret,
        lambda BM, BK: [
            pltpu.VMEM((BM, BK // 2), jnp.bfloat16),
            pltpu.VMEM((BM, BK // 2), jnp.bfloat16),
        ],
    )
    return out + _zp_correction(x32, s, b, g)[:M].astype(out.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "interpret"))
def matmul_w4a8(
    x: jax.Array,  # [M, K] bf16/f32 activations
    qw: jax.Array,  # [K//2, N] uint8
    s: jax.Array,  # [K//g, N] f32
    b: jax.Array,  # [K//g, N] f32
    group_size: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """W4A8: per-token symmetric int8 activation quantization feeding the
    int8 MXU (reference headline path analogue `w8a8_int8.py`, applied to
    W4 weights); quantization happens in-kernel.  The zero-point term
    uses the REAL activations (exact for the b/-8s terms; only the q*s
    term carries activation-quant error) — its operands pre-divide by sx
    so it can ride the kernel's sx output epilogue."""
    M, K = x.shape
    N = qw.shape[1]
    g = group_size
    BK, BN, BM, Mp = _plan(M, K, N, g)
    x32 = x.astype(jnp.float32)
    if Mp != M:
        x32 = jnp.pad(x32, ((0, Mp - M), (0, 0)))
    sx, sxt = _sx_tile(x32, Mp)
    out = _call_w4_kernel(
        _w4a8_matmul_kernel, x32.astype(x.dtype), qw, s, None,
        (), (sxt,), M, K, N, g, interpret,
        lambda BM, BK: [],
    )
    return out + _zp_correction(x32, s, b, g)[:M].astype(out.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "interpret"))
def matmul_w4a16x2(
    x: jax.Array,  # [M, K]
    qw: jax.Array,  # [K//2, N] uint8
    s: jax.Array,  # [K//g, N] f32
    b: jax.Array,  # [K//g, N] f32
    group_size: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """A16 on the int8 MXU via exact residual two-component decomposition
    (see _w4a16x2_matmul_kernel)."""
    M, K = x.shape
    N = qw.shape[1]
    g = group_size
    BK, BN, BM, Mp = _plan(M, K, N, g)
    x32 = x.astype(jnp.float32)
    if Mp != M:
        x32 = jnp.pad(x32, ((0, Mp - M), (0, 0)))
    sx, sxt = _sx_tile(x32, Mp)
    out = _call_w4_kernel(
        _w4a16x2_matmul_kernel, x32.astype(x.dtype), qw, s, None,
        (), (sxt,), M, K, N, g, interpret,
        lambda BM, BK: [pltpu.VMEM((2, BM, BK), jnp.int8)],
    )
    return out + _zp_correction(x32, s, b, g)[:M].astype(out.dtype)


# ----------------------------------------------------------------------
# Stacked-layer variants: the trunk scan carries weights as [L, ...]
# stacks; consuming them as scan xs materializes a full per-layer copy at
# every pallas-call boundary (measured r5: 56.5 ms/step vs 22 ms for the
# same matmuls — scripts/r5_probe_decode.py scanmm).  These kernels take
# the WHOLE stack plus a scalar-prefetched layer index and DMA only the
# addressed layer's blocks — the same principle as the KV pool ("carry it,
# address with combined indices", CLAUDE.md).
# ----------------------------------------------------------------------
def _drop_prefetch(kernel):
    """PrefetchScalarGridSpec hands the scalar ref to the kernel as its
    first argument; the index maps are its only consumer."""

    def body(l_ref, *refs, **kw):
        return kernel(*refs, **kw)

    return body


def _call_w4_kernel_stacked(
    kernel, x, qw, s, extra, M, K, N, g, layer, interpret, scratch
):
    BK, BN, BM, Mp = _plan(M, K, N, g)
    if x.shape[0] != Mp:
        x = jnp.pad(x, ((0, Mp - x.shape[0]), (0, 0)))
    in_specs = [
        pl.BlockSpec(
            (BM, BK), lambda m, n, k, l_ref: (m, k), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, BK // 2, BN),
            lambda m, n, k, l_ref: (l_ref[0], k, n),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, BK // g, BN),
            lambda m, n, k, l_ref: (l_ref[0], k, n),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [x, qw, s]
    for e in extra:  # sx tile [Mp, 128]
        in_specs.append(
            pl.BlockSpec(
                (BM, 128), lambda m, n, k, l_ref: (m, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(e)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // BM, N // BN, K // BK),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (BM, BN), lambda m, n, k, l_ref: (m, n), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)] + scratch(BM, BK),
    )
    out = pl.pallas_call(
        functools.partial(
            _drop_prefetch(kernel), group_size=g, out_dtype=x.dtype,
            stacked=True,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), *args)
    return out[:M]


@functools.partial(jax.jit, static_argnames=("group_size", "interpret"))
def matmul_w4_stacked(
    x: jax.Array,  # [M, K]
    qw: jax.Array,  # [L, K//2, N] uint8
    s: jax.Array,  # [L, K//g, N] f32
    b: jax.Array,  # [L, K//g, N] f32
    layer: jax.Array,  # scalar int32
    group_size: int = 128,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    N = qw.shape[-1]
    g = group_size
    _, _, _, Mp = _plan(M, K, N, g)
    x32 = x.astype(jnp.float32)
    if Mp != M:
        x32 = jnp.pad(x32, ((0, Mp - M), (0, 0)))
    out = _call_w4_kernel_stacked(
        _w4_matmul_kernel, x32.astype(jnp.bfloat16), qw, s, (),
        M, K, N, g, layer, interpret,
        lambda BM, BK: [
            pltpu.VMEM((BM, BK // 2), jnp.bfloat16),
            pltpu.VMEM((BM, BK // 2), jnp.bfloat16),
        ],
    )
    return out + _zp_correction(x32, s[layer], b[layer], g)[:M].astype(
        out.dtype
    )


@functools.partial(jax.jit, static_argnames=("group_size", "interpret"))
def matmul_w4a8_stacked(
    x: jax.Array,
    qw: jax.Array,  # [L, K//2, N] uint8
    s: jax.Array,  # [L, K//g, N] f32
    b: jax.Array,
    layer: jax.Array,
    group_size: int = 128,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    N = qw.shape[-1]
    g = group_size
    _, _, _, Mp = _plan(M, K, N, g)
    x32 = x.astype(jnp.float32)
    if Mp != M:
        x32 = jnp.pad(x32, ((0, Mp - M), (0, 0)))
    sx, sxt = _sx_tile(x32, Mp)
    out = _call_w4_kernel_stacked(
        _w4a8_matmul_kernel, x32.astype(x.dtype), qw, s, (sxt,),
        M, K, N, g, layer, interpret, lambda BM, BK: [],
    )
    return out + _zp_correction(x32, s[layer], b[layer], g)[:M].astype(
        out.dtype
    )


def einsum_w4_stacked(x, w, layer, eq: str, act: str = "a16") -> jax.Array:
    """Stacked-layer routing twin of `einsum_w4` (trunk scan path)."""
    import os

    interpret = bool(os.environ.get("SGLANG_TPU_PALLAS_INTERPRET"))
    if w.perm is not None:
        x = jnp.take(x, w.perm[layer], axis=-1)
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    fn = matmul_w4_stacked
    if act == "a8" and x2.shape[0] <= 64:
        fn = matmul_w4a8_stacked
    out = fn(
        x2, w.q, w.s, w.b, layer, group_size=w.group_size,
        interpret=interpret,
    )
    return out.reshape(*lead, out.shape[-1])


def einsum_w4(x: jax.Array, w, eq: str, act: str = "a16") -> jax.Array:
    """Route a model einsum (contraction of x's last dim with the weight's
    row dim) through the Pallas W4 kernels.  Falls back to gather-permuted
    activations for GPTQ act-order.  ``act='a8'`` selects the int8-MXU
    W4A8 kernel (per-token activation quant).

    Routing by M (probe10): the int8-MXU group-dot kernels' VPU cost
    scales with M while matmul_w4's per-weight work is M-independent, so
    past M=64 the bf16 kernel dominates both — and prefill is
    compute-bound anyway."""
    import os

    interpret = bool(os.environ.get("SGLANG_TPU_PALLAS_INTERPRET"))
    if w.perm is not None:
        x = jnp.take(x, w.perm, axis=-1)
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    fn = {
        "a8": matmul_w4a8,
        "a16x2": matmul_w4a16x2,
        "a16": matmul_w4,
    }[act]
    if act in ("a16x2", "a8") and x2.shape[0] > 64:
        fn = matmul_w4
    out = fn(
        x2, w.q, w.s, w.b, group_size=w.group_size, interpret=interpret
    )
    return out.reshape(*lead, out.shape[-1])


# ----------------------------------------------------------------------
# Weight-only W8 (int8 / fp8-e4m3) dequant matmul: unlike the grouped W4
# kernels, the per-OUTPUT-CHANNEL scale applies to the dot OUTPUT — one
# [BM, BN] multiply at the k-loop end — so per-weight-element VPU work is
# a single convert (the XLA dequant einsum instead materializes the bf16
# weight in HBM each step: 3x the traffic).  Reference counterpart:
# `sgl-kernel/csrc/gemm/` int8/fp8 GEMMs.
# ----------------------------------------------------------------------
def _w8_matmul_kernel(
    x_ref,  # [BM, BK] bf16
    qw_ref,  # [BK, BN] int8 | f8_e4m3
    s_ref,  # [1, BN] f32 per-output-channel scale
    o_ref,  # [BM, BN] out dtype
    acc_ref,  # [BM, BN] f32 scratch
    *,
    out_dtype,
    stacked: bool = False,
):
    if stacked:
        qw_ref = qw_ref.at[0]
        s_ref = s_ref.at[0]
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = qw_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += jnp.dot(
        x_ref[...], w, preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[0, :][None, :]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def matmul_w8(
    x: jax.Array,  # [M, K]
    qw: jax.Array,  # [K, N] int8 | f8_e4m3
    s: jax.Array,  # [1, N] f32 (per-output-channel)
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    N = qw.shape[1]
    BK = _pick_block(K, 128, 2048)
    BN = _pick_block(N, 128, 1024)
    BM = 512 if M > 256 else max(-(-M // 16) * 16, 16)
    Mp = -(-M // BM) * BM
    xb = x.astype(jnp.bfloat16)
    if Mp != M:
        xb = jnp.pad(xb, ((0, Mp - M), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_w8_matmul_kernel, out_dtype=x.dtype),
        grid=(Mp // BM, N // BN, K // BK),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BM, BN), lambda m, n, k: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xb, qw, s.reshape(1, N).astype(jnp.float32))
    return out[:M]


@functools.partial(jax.jit, static_argnames=("interpret",))
def matmul_w8_stacked(
    x: jax.Array,  # [M, K]
    qw: jax.Array,  # [L, K, N] int8
    s: jax.Array,  # [L, 1, N] f32
    layer: jax.Array,  # scalar int32
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    N = qw.shape[-1]
    BK = _pick_block(K, 128, 2048)
    BN = _pick_block(N, 128, 1024)
    BM = 512 if M > 256 else max(-(-M // 16) * 16, 16)
    Mp = -(-M // BM) * BM
    xb = x.astype(jnp.bfloat16)
    if Mp != M:
        xb = jnp.pad(xb, ((0, Mp - M), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // BM, N // BN, K // BK),
        in_specs=[
            pl.BlockSpec(
                (BM, BK), lambda m, n, k, l_ref: (m, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BK, BN), lambda m, n, k, l_ref: (l_ref[0], k, n),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, BN), lambda m, n, k, l_ref: (l_ref[0], 0, n),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (BM, BN), lambda m, n, k, l_ref: (m, n), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _drop_prefetch(_w8_matmul_kernel), out_dtype=x.dtype,
            stacked=True,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        xb,
        qw,
        s.reshape(s.shape[0], 1, N).astype(jnp.float32),
    )
    return out[:M]


def einsum_w8_stacked(x: jax.Array, w, layer, eq: str) -> jax.Array:
    """Stacked-layer twin of `einsum_w8` (trunk scan path)."""
    import os

    interpret = bool(os.environ.get("SGLANG_TPU_PALLAS_INTERPRET"))
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    out = matmul_w8_stacked(x2, w.q, w.s, layer, interpret=interpret)
    return out.reshape(*lead, out.shape[-1])


# ----------------------------------------------------------------------
# W8A8 on the int8 MXU: raw int8 weights AND activations feed the MXU
# directly (i32 accumulation), so per-weight-element VPU work is ZERO —
# unlike the w8 dequant kernel, whose int8->bf16 convert serializes with
# the MXU (measured 247 GB/s), and the bf16-dequant W4 kernel's
# mask/convert/mul chain (240-305 GB/s).  Per-token activation scales and
# per-output-channel weight scales combine as a rank-1 epilogue at the
# k-loop end.  Reference counterpart: `layers/quantization/w8a8_int8.py`
# (the Ascend headline path) / sgl-kernel int8 GEMMs.
# ----------------------------------------------------------------------
def _w8a8_matmul_kernel(
    xq_ref,  # [BM, BK] int8 (pre-quantized activations)
    qw_ref,  # [1, BK, BN] int8 (stacked) | [BK, BN]
    s_ref,  # [1, 1, BN] f32 | [1, BN]
    sx_ref,  # [BM, 128] f32 per-token activation scale (col 0)
    o_ref,  # [BM, BN] out dtype
    acc_ref,  # [BM, BN] i32 scratch (exact)
    *,
    out_dtype,
    stacked: bool = False,
):
    if stacked:
        qw_ref = qw_ref.at[0]
        s_ref = s_ref.at[0]
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        xq_ref[...], qw_ref[...], preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32)
            * sx_ref[:, :1]
            * s_ref[0, :][None, :]
        ).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def matmul_w8a8_stacked(
    x: jax.Array,  # [M, K] bf16/f32
    qw: jax.Array,  # [L, K, N] int8
    s: jax.Array,  # [L, 1, N] f32 per-output-channel
    layer: jax.Array,  # scalar int32
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    N = qw.shape[-1]
    BK = _pick_block(K, 128, 2048)
    BN = _pick_block(N, 128, 1024)
    BM = 512 if M > 256 else max(-(-M // 16) * 16, 16)
    Mp = -(-M // BM) * BM
    x32 = x.astype(jnp.float32)
    if Mp != M:
        x32 = jnp.pad(x32, ((0, Mp - M), (0, 0)))
    sx, sxt = _sx_tile(x32, Mp)
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // BM, N // BN, K // BK),
        in_specs=[
            pl.BlockSpec(
                (BM, BK), lambda m, n, k, l_ref: (m, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BK, BN), lambda m, n, k, l_ref: (l_ref[0], k, n),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, BN), lambda m, n, k, l_ref: (l_ref[0], 0, n),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BM, 128), lambda m, n, k, l_ref: (m, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (BM, BN), lambda m, n, k, l_ref: (m, n), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.int32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _drop_prefetch(_w8a8_matmul_kernel), out_dtype=x.dtype,
            stacked=True,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        xq,
        qw,
        s.reshape(s.shape[0], 1, N).astype(jnp.float32),
        sxt,
    )
    return out[:M]


def einsum_w8a8_stacked(x: jax.Array, w, layer, eq: str) -> jax.Array:
    """Stacked-layer W8A8 int8-MXU path (trunk scan)."""
    import os

    interpret = bool(os.environ.get("SGLANG_TPU_PALLAS_INTERPRET"))
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    out = matmul_w8a8_stacked(x2, w.q, w.s, layer, interpret=interpret)
    return out.reshape(*lead, out.shape[-1])


def einsum_w8(x: jax.Array, w, eq: str) -> jax.Array:
    """Route a weight-only int8/fp8 einsum (contraction of x's last dim)
    through the Pallas W8 kernel."""
    import os

    interpret = bool(os.environ.get("SGLANG_TPU_PALLAS_INTERPRET"))
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    out = matmul_w8(x2, w.q, w.s, interpret=interpret)
    return out.reshape(*lead, out.shape[-1])
