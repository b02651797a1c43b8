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
8-bit shifts nor uint8->float casts; the round-2 kernel's i32-domain
unpack was the dominant VPU cost).  The -8 offset and the /16 fold into
the zero-point term and the group scale respectively.

Two kernels:
  * matmul_w4   — exact W4A16: masks + int8->bf16 converts + bf16 MXU.
                  Conversion-bound at ~350 GB/s weight-stream (probe6).
  * matmul_w4a8 — W4A8: per-token int8 activations hit the int8 MXU with
                  the RAW masked bytes (zero converts); scales apply
                  post-dot per group.  ~90% of the 819 GB/s weight-read
                  roofline on v5e (probe6: 40 us for [64,4096]x[4096,14336]).

Zero-point convention: dequant w = q*s - b.  Both kernels compute
    x_lo @ (q_lo * s)  +  x_hi @ ((q_hi - 8) * s)
so the caller subtracts/adds the tiny XLA-side correction
    out += 8 * (xsum_hi @ s) - xsum @ b
(the per-group activation sums make it a [M, K/g] x [K/g, N] matmul XLA
fuses with the epilogue).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w4_matmul_kernel(
    xlo_ref,  # [Mp, BK//2] bf16 — activation cols for the lo nibbles
    xhi_ref,  # [Mp, BK//2] bf16 — activation cols for the hi nibbles
    qw_ref,  # [BK//2, BN] uint8
    s_ref,  # [BK//g, BN] f32
    o_ref,  # [Mp, BN] out dtype
    acc_ref,  # [Mp, BN] f32 scratch
    *,
    group_size: int,
    out_dtype,
):
    """Exact A16 path: int8-domain masks + direct int8->bf16 converts."""
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
    xlo_ref,  # [Mp, BK//2] int8
    xhi_ref,  # [Mp, BK//2] int8
    qw_ref,  # [BK//2, BN] uint8
    s_ref,  # [BK//g, BN] f32
    sx_ref,  # [Mp, 128] f32 — per-token activation scale (col 0)
    o_ref,  # [Mp, BN] out dtype
    acc_ref,  # [Mp, BN] f32 scratch
    *,
    group_size: int,
    out_dtype,
):
    """W4A8 path: the int8 MXU consumes the masked bytes directly —
    per-weight VPU work is exactly two int8 masks.  Group scales apply to
    the per-group int32 partial dots (the /16 of the hi plane rides along:
    dhi is 16x the true hi contribution)."""
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
    a = jnp.zeros_like(acc_ref)
    for G in range(G_blk):
        r0, r1 = G * gh, (G + 1) * gh
        dlo = jnp.dot(
            xlo_ref[:, r0:r1], lo8[r0:r1], preferred_element_type=jnp.int32
        )
        dhi = jnp.dot(
            xhi_ref[:, r0:r1], hi8[r0:r1], preferred_element_type=jnp.int32
        )
        a += (
            dlo.astype(jnp.float32) + dhi.astype(jnp.float32) * (1.0 / 16.0)
        ) * s_ref[G, :][None, :]
    acc_ref[...] += a

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] * sx_ref[:, :1]).astype(out_dtype)


def _w4a16x2_matmul_kernel(
    xlo_ref,  # [2, BM, BK//2] int8 — [coarse; residual] lo-plane rows
    xhi_ref,  # [2, BM, BK//2] int8
    qw_ref,  # [BK//2, BN] uint8
    s_ref,  # [BK//g, BN] f32
    sx_ref,  # [BM, 128] f32 — per-token coarse scale (col 0)
    o_ref,  # [BM, BN] out dtype
    acc_ref,  # [BM, BN] f32 scratch
    *,
    group_size: int,
    out_dtype,
):
    """Exact-class A16 path on the int8 MXU: the bf16 activation row is
    decomposed as x ~= s1*(q1 + q2/127) (two int8 components, ~14 mantissa
    bits — more precise than one bf16 MXU pass), so the weight bytes feed
    the MXU raw (two masks) and the kernel runs at the weight-DMA floor
    like the W4A8 kernel.  Both components ride the SAME dot as extra M
    rows (fixed MXU pass latency dominated when each group issued four
    small dots — probe6 W4_FULL)."""
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
    xlo = xlo_ref[...].reshape(2 * BM, BKh)
    xhi = xhi_ref[...].reshape(2 * BM, BKh)
    a = jnp.zeros_like(acc_ref)
    inv127 = 1.0 / 127.0
    inv16 = 1.0 / 16.0
    for G in range(G_blk):
        r0, r1 = G * gh, (G + 1) * gh
        dlo = jnp.dot(
            xlo[:, r0:r1], lo8[r0:r1], preferred_element_type=jnp.int32
        )  # [2*BM, BN]
        dhi = jnp.dot(
            xhi[:, r0:r1], hi8[r0:r1], preferred_element_type=jnp.int32
        )
        d = dlo.astype(jnp.float32) + dhi.astype(jnp.float32) * inv16
        a += (d[:BM] + d[BM:] * inv127) * s_ref[G, :][None, :]
    acc_ref[...] += a

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] * sx_ref[:, :1]).astype(out_dtype)


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
    BK = _pick_block(K, g, 4096)
    BN = _pick_block(N, 128, 1024)
    # Tile M too: a chunked-prefill extend feeds thousands of rows, and an
    # untiled Mp block blew the scoped-VMEM limit at M=4096.
    BM = 256 if M > 256 else max(-(-M // 16) * 16, 16)
    Mp = -(-M // BM) * BM
    return BK, BN, BM, Mp


def _nibble_plane_split(x, Mp: int, K: int, g: int):
    """lo plane covers in-group cols [0, g/2), hi plane [g/2, g) — matches
    pack_w4's packing."""
    xg = x.reshape(Mp, K // g, g)
    x_lo = xg[:, :, : g // 2].reshape(Mp, K // 2)
    x_hi = xg[:, :, g // 2 :].reshape(Mp, K // 2)
    return xg, x_lo, x_hi


def _zp_correction(xg, s, b):
    """8*(xsum_hi @ s) - xsum @ b  (see module docstring)."""
    g = xg.shape[-1]
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)  # [Mp, K/g]
    xsum_hi = jnp.sum(xg[:, :, g // 2 :].astype(jnp.float32), axis=2)
    return 8.0 * (xsum_hi @ s) - (xsum @ b)


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
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    xg, x_lo, x_hi = _nibble_plane_split(x, Mp, K, g)

    out = pl.pallas_call(
        functools.partial(
            _w4_matmul_kernel, group_size=g, out_dtype=x.dtype
        ),
        grid=(Mp // BM, N // BN, K // BK),
        in_specs=[
            pl.BlockSpec(
                (BM, BK // 2), lambda m, n, k: (m, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BM, BK // 2), lambda m, n, k: (m, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BK // 2, BN), lambda m, n, k: (k, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BK // g, BN), lambda m, n, k: (k, n), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (BM, BN), lambda m, n, k: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_lo.astype(jnp.bfloat16), x_hi.astype(jnp.bfloat16), qw, s)
    out = out + _zp_correction(xg, s, b).astype(out.dtype)
    return out[:M]


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
    W4 weights; v5e int8 MXU runs 2x bf16 rate and the kernel streams
    weights at ~90% of HBM roofline)."""
    M, K = x.shape
    N = qw.shape[1]
    g = group_size
    BK, BN, BM, Mp = _plan(M, K, N, g)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    # per-token symmetric quant
    x32 = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=1, keepdims=True), 1e-9) / 127.0
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    xg, xq_lo, xq_hi = _nibble_plane_split(xq, Mp, K, g)
    xg_real = x.reshape(Mp, K // g, g)
    sx_tile = jnp.broadcast_to(sx, (Mp, 128))

    out = pl.pallas_call(
        functools.partial(
            _w4a8_matmul_kernel, group_size=g, out_dtype=x.dtype
        ),
        grid=(Mp // BM, N // BN, K // BK),
        in_specs=[
            pl.BlockSpec(
                (BM, BK // 2), lambda m, n, k: (m, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BM, BK // 2), lambda m, n, k: (m, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BK // 2, BN), lambda m, n, k: (k, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BK // g, BN), lambda m, n, k: (k, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BM, 128), lambda m, n, k: (m, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (BM, BN), lambda m, n, k: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq_lo, xq_hi, qw, s, sx_tile)
    # zero-point correction uses the REAL activations (exact for the b/-8s
    # terms; only the q*s term carries activation-quant error)
    out = out + _zp_correction(xg_real, s, b).astype(out.dtype)
    return out[:M]


@functools.partial(jax.jit, static_argnames=("group_size", "interpret"))
def matmul_w4a16x2(
    x: jax.Array,  # [M, K]
    qw: jax.Array,  # [K//2, N] uint8
    s: jax.Array,  # [K//g, N] f32
    b: jax.Array,  # [K//g, N] f32
    group_size: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """A16 on the int8 MXU via residual two-component activation
    decomposition (see _w4a16x2_matmul_kernel) — the compute-precision
    analogue of XLA's multi-pass bf16 matmuls, at the W4 weight-DMA floor."""
    M, K = x.shape
    N = qw.shape[1]
    g = group_size
    BK, BN, BM, Mp = _plan(M, K, N, g)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    x32 = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=1, keepdims=True), 1e-9) / 127.0
    q1 = jnp.clip(jnp.round(x32 / sx), -127, 127)
    resid = x32 - q1 * sx
    q2 = jnp.clip(jnp.round(resid / (sx * (1.0 / 127.0))), -127, 127)
    q1 = q1.astype(jnp.int8)
    q2 = q2.astype(jnp.int8)
    _, q1l, q1h = _nibble_plane_split(q1, Mp, K, g)
    _, q2l, q2h = _nibble_plane_split(q2, Mp, K, g)
    xlo = jnp.stack([q1l, q2l])  # [2, Mp, K//2]
    xhi = jnp.stack([q1h, q2h])
    xg_real = x.reshape(Mp, K // g, g)
    sx_tile = jnp.broadcast_to(sx, (Mp, 128))

    xspec = pl.BlockSpec(
        (2, BM, BK // 2), lambda m, n, k: (0, m, k), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _w4a16x2_matmul_kernel, group_size=g, out_dtype=x.dtype
        ),
        grid=(Mp // BM, N // BN, K // BK),
        in_specs=[
            xspec, xspec,
            pl.BlockSpec(
                (BK // 2, BN), lambda m, n, k: (k, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BK // g, BN), lambda m, n, k: (k, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BM, 128), lambda m, n, k: (m, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (BM, BN), lambda m, n, k: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xlo, xhi, qw, s, sx_tile)
    out = out + _zp_correction(xg_real, s, b).astype(out.dtype)
    return out[:M]


def einsum_w4(x: jax.Array, w, eq: str, act: str = "a16") -> jax.Array:
    """Route a model einsum (contraction of x's last dim with the weight's
    row dim) through the Pallas W4 kernels.  Falls back to gather-permuted
    activations for GPTQ act-order.  ``act='a8'`` selects the int8-MXU
    W4A8 kernel (per-token activation quant)."""
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
    if act == "a16x2" and x2.shape[0] > 256:
        # prefill-sized M: the per-group int8 dots under-fill the MXU
        # (K-depth g/2); the full-depth bf16 kernel wins there, and
        # prefill is compute- not weight-bandwidth-bound anyway
        fn = matmul_w4
    out = fn(
        x2, w.q, w.s, w.b, group_size=w.group_size, interpret=interpret
    )
    return out.reshape(*lead, out.shape[-1])
