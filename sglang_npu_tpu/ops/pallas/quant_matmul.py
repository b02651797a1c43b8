"""Pallas W4A16 grouped dequant-matmul (TPU).

TPU counterpart of the reference's AWQ/GPTQ dequant GEMM kernels
(`sgl-kernel/csrc/gemm/awq_kernel.cu`, `layers/quantization/awq_triton.py`):
weights stream from HBM as packed 4-bit nibbles and are dequantized
in-register (VPU) right before the MXU dot, so HBM weight traffic is
~K*N/2 bytes — a 4x cut vs bf16, which directly bounds decode latency
(decode GEMV is weight-bandwidth-bound).

Layout contract (see `layers/quantization.QuantizedWeightW4`):
  packed[Gg + j, n] byte = q4[Gg + j] | q4[Gg + j + g/2] << 4   (in-group)
  dequant: w = q4 * s[G, n] - b[G, n]
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
    """Nibble-split dequant matmul: out += x_lo @ (lo*s) + x_hi @ (hi*s).

    The packed byte at row j of group G holds q[G*g+j] (lo) and
    q[G*g+j+g/2] (hi), so the lo/hi nibble planes each cover half the K
    columns; the caller pre-splits x into those column sets.  Nibbles go
    uint8 -(bitcast)-> int8 -> bf16 (no int32 round-trip: 8->32->8 bit
    relayouts were the dominant cost of kernel v1, and Mosaic has no
    uint8->float cast), and scales broadcast over the in-group sublane
    view instead of a repeat.  The zero-point term -xsum_g @ b_g is a
    tiny [M, K/g] x [K/g, N] matmul the CALLER subtracts in XLA —
    in-kernel it needed an unsupported lane-dim reshape for the group
    sums."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    BKh, BN = qw_ref.shape
    g = group_size
    gh = g // 2
    G_blk = (2 * BKh) // g
    # int32 hop: Mosaic supports neither uint8->float casts nor 8/16-bit
    # shifts on this toolchain (probed); uint8 -> int32 -> bf16 is the one
    # compiling pipeline
    p = qw_ref[...].astype(jnp.int32)
    s = s_ref[...].astype(jnp.bfloat16).reshape(G_blk, 1, BN)
    lo = (p & 0xF).astype(jnp.bfloat16).reshape(G_blk, gh, BN)
    hi = ((p >> 4) & 0xF).astype(jnp.bfloat16).reshape(G_blk, gh, BN)
    wlo = (lo * s).reshape(BKh, BN)
    whi = (hi * s).reshape(BKh, BN)
    acc = jnp.dot(xlo_ref[...], wlo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xhi_ref[...], whi, preferred_element_type=jnp.float32)
    acc_ref[...] += acc

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _pick_block(total: int, unit: int, cap: int) -> int:
    """Largest multiple of `unit` dividing `total`, at most `cap`."""
    best = unit
    m = unit
    while m <= cap:
        if total % m == 0:
            best = m
        m *= 2
    return best


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
    BK = _pick_block(K, g, 2048)
    BN = _pick_block(N, 128, 512)
    # Tile M too: a chunked-prefill extend feeds thousands of rows, and an
    # untiled Mp block (kernel v2) blew the 16MB scoped-VMEM limit at
    # M=4096 (x tiles + f32 acc scale with M).
    BM = 256 if M > 256 else max(-(-M // 16) * 16, 16)
    Mp = -(-M // BM) * BM
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    # nibble-plane activation split: lo plane covers in-group cols [0, g/2),
    # hi plane covers [g/2, g) — matches the packing in pack_w4
    xg = x.reshape(Mp, K // g, g)
    x_lo = xg[:, :, : g // 2].reshape(Mp, K // 2)
    x_hi = xg[:, :, g // 2 :].reshape(Mp, K // 2)

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
    # zero-point correction: per-group activation sums @ b (tiny matmul,
    # fused by XLA with the subtract)
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)  # [Mp, K/g]
    out = out - (xsum @ b).astype(out.dtype)
    return out[:M]


def einsum_w4(x: jax.Array, w, eq: str) -> jax.Array:
    """Route a model einsum (contraction of x's last dim with the weight's
    row dim) through the Pallas W4 kernel.  Falls back to gather-permuted
    activations for GPTQ act-order."""
    import os

    interpret = bool(os.environ.get("SGLANG_TPU_PALLAS_INTERPRET"))
    if w.perm is not None:
        x = jnp.take(x, w.perm, axis=-1)
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    out = matmul_w4(
        x2, w.q, w.s, w.b, group_size=w.group_size, interpret=interpret
    )
    return out.reshape(*lead, out.shape[-1])
