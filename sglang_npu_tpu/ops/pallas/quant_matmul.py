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
    x_ref,  # [Mp, BK] bf16
    qw_ref,  # [BK//2, BN] uint8
    s_ref,  # [BK//g, BN] f32
    b_ref,  # [BK//g, BN] f32
    o_ref,  # [Mp, BN] out dtype
    acc_ref,  # [Mp, BN] f32 scratch
    *,
    group_size: int,
    out_dtype,
):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    BKh, BN = qw_ref.shape
    g = group_size
    G_blk = (2 * BKh) // g
    v = qw_ref[...].astype(jnp.int32).reshape(G_blk, g // 2, BN)
    lo = v & 0xF
    hi = (v >> 4) & 0xF
    q4 = jnp.concatenate([lo, hi], axis=1).astype(jnp.float32)  # [G, g, BN]
    wd = q4 * s_ref[...].reshape(G_blk, 1, BN) - b_ref[...].reshape(G_blk, 1, BN)
    wd = wd.reshape(2 * BKh, BN).astype(jnp.bfloat16)
    acc_ref[...] += jnp.dot(
        x_ref[...].astype(jnp.bfloat16), wd, preferred_element_type=jnp.float32
    )

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
    Mp = max(-(-M // 16) * 16, 16)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _w4_matmul_kernel, group_size=g, out_dtype=x.dtype
        ),
        grid=(N // BN, K // BK),
        in_specs=[
            pl.BlockSpec((Mp, BK), lambda n, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (BK // 2, BN), lambda n, k: (k, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BK // g, BN), lambda n, k: (k, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BK // g, BN), lambda n, k: (k, n), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (Mp, BN), lambda n, k: (0, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((Mp, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, qw, s, b)
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
