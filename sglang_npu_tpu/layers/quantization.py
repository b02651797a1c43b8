"""Weight quantization: INT8, W4A16 (AWQ/GPTQ), FP8.

Counterpart of the reference's `layers/quantization/` stack
(`w8a8_int8.py`, `awq.py:1-771`, `gptq.py`, `fp8.py:1-1205`) re-designed
for TPU:

  * INT8 weight-only: per-output-channel scales; int8->bf16 dequant fuses
    into the XLA dot operand read, halving HBM weight traffic.
  * W4A16: 4-bit weights with group-wise scales+zeros (AWQ/GPTQ layout).
    Storage packs two nibbles per byte **within each group** (rows k and
    k+g/2 of a group share a byte) so tensor-parallel sharding along K
    stays group-aligned.  Matmul runs either through XLA (dequant fused)
    or the Pallas dequant-matmul kernel (`ops/pallas/quant_matmul.py`).
  * FP8 (e4m3) weight-only: per-output-channel scale, bf16 compute (v5e
    has no fp8 MXU; the win is halved weight bandwidth like int8 but with
    better dynamic range than int8 for outlier-heavy weights).

Checkpoint ingestion for real AWQ (autoawq GEMM layout) and GPTQ
checkpoints lives in `model_loader/quant_ingest.py`.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedWeight:
    """int8 weight + per-output-channel scale; layout matches the bf16
    weight it replaces ([..., In, Out])."""

    q: jax.Array  # int8 [..., In, Out]
    s: jax.Array  # f32  [..., 1, Out]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedWeightFP8:
    """fp8 e4m3 weight + per-output-channel scale ([..., In, Out])."""

    q: jax.Array  # f8_e4m3 [..., In, Out]
    s: jax.Array  # f32     [..., 1, Out]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedWeightFP8Block:
    """Blockwise-FP8 weight (native DeepSeek-V3/R1 checkpoint format,
    reference `layers/quantization/fp8.py` + `fp8_kernel.py` blockwise-128
    path): q fp8 e4m3 [..., K, N]; s f32 [..., ceil(K/bk), ceil(N/bn)]
    holds the PER-BLOCK dequant scale (HF `weight_scale_inv`, transposed
    to our [K, N] convention).  Dequant fuses into the XLA dot operand."""

    q: jax.Array  # f8_e4m3 [..., K, N]
    s: jax.Array  # f32     [..., ceil(K/bk), ceil(N/bn)]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedWeightW4:
    """W4A16 grouped weight (AWQ/GPTQ class).

    Logical weight W[K, N] with group size g along K:
        W[k, n] = (q4[k, n] - z[k//g, n]) * s[k//g, n]
    Stored packed: two nibbles per byte within each group —
        packed[G, j, n] = q4[G*g + j] | (q4[G*g + j + g//2] << 4)
    flattened to [..., K//2, N] uint8.  Unpacking a contiguous row range
    that covers whole groups yields those same rows (TP-shard safe).

    ``b`` pre-multiplies zeros by scales (dequant = q*s - b).
    ``perm`` (optional) is a K-permutation applied to the *activation*
    for GPTQ act-order (desc_act) checkpoints.
    """

    q: jax.Array  # uint8 [..., K//2, N]
    s: jax.Array  # f32   [..., K//g, N]
    b: jax.Array  # f32   [..., K//g, N]  (= z * s)
    perm: Optional[jax.Array] = None  # int32 [..., K] or None

    @property
    def group_size(self) -> int:
        K = 2 * self.q.shape[-2]
        return K // self.s.shape[-2]


def pack_w4(q4, group_size: int):
    """[..., K, N] int 0..15 -> [..., K//2, N] uint8 (in-group packing).

    The hi nibble is stored XOR 8, so that on TPU the byte masked with
    0xF0 *as signed int8* equals exactly 16*(q_hi - 8): both nibble planes
    then extract with ONE int8 mask each inside the Pallas kernels — no
    int32 round-trip, no shifts (unsupported on 8-bit lanes in Mosaic) —
    and the constant -8 offset folds into the zero-point term
    (`ops/pallas/quant_matmul.py`)."""
    K = q4.shape[-2]
    g = group_size
    assert K % g == 0 and g % 2 == 0, (K, g)
    v = q4.astype(jnp.uint8).reshape(*q4.shape[:-2], K // g, g, q4.shape[-1])
    lo = v[..., : g // 2, :]
    hi = v[..., g // 2 :, :] ^ 8
    packed = lo | (hi << 4)
    return packed.reshape(*q4.shape[:-2], K // 2, q4.shape[-1])


def unpack_w4(packed, group_size: int):
    """[..., K//2, N] uint8 -> [..., K, N] uint8 values 0..15."""
    Kh = packed.shape[-2]
    g = group_size
    v = packed.reshape(*packed.shape[:-2], (2 * Kh) // g, g // 2, packed.shape[-1])
    lo = v & 0xF
    hi = (v >> 4) ^ 8
    full = jnp.concatenate([lo, hi], axis=-2)
    return full.reshape(*packed.shape[:-2], 2 * Kh, packed.shape[-1])


def dequant(w, dtype):
    if isinstance(w, QuantizedWeight):
        return w.q.astype(dtype) * w.s.astype(dtype)
    if isinstance(w, QuantizedWeightFP8):
        return w.q.astype(dtype) * w.s.astype(dtype)
    if isinstance(w, QuantizedWeightFP8Block):
        K, N = w.q.shape[-2], w.q.shape[-1]
        bk = -(-K // w.s.shape[-2])
        bn = -(-N // w.s.shape[-1])
        sb = jnp.repeat(w.s, bk, axis=-2)[..., :K, :]
        sb = jnp.repeat(sb, bn, axis=-1)[..., :N]
        # dequant in f32, single rounding into the compute dtype (matches
        # the reference's fp32 block-dequant then cast)
        return (w.q.astype(jnp.float32) * sb).astype(dtype)
    if isinstance(w, QuantizedWeightW4):
        g = w.group_size
        vals = unpack_w4(w.q, g).astype(dtype)  # [..., K, N]
        K, N = vals.shape[-2], vals.shape[-1]
        lead = vals.shape[:-2]
        grouped = vals.reshape(*lead, K // g, g, N)
        wd = grouped * w.s[..., :, None, :].astype(dtype) - w.b[
            ..., :, None, :
        ].astype(dtype)
        wd = wd.reshape(*lead, K, N)
        if w.perm is not None:
            # inverse-permute rows back to activation order
            inv = jnp.argsort(w.perm, axis=-1)
            wd = jnp.take_along_axis(wd, inv[..., :, None], axis=-2)
        return wd
    return w


def matmul(x: jax.Array, w, eq: str, layer=None) -> jax.Array:
    """einsum that transparently dequantizes quantized weight operands; the
    convert+scale fuses into the dot's operand read (XLA path).  The
    ModelRunner may substitute the Pallas dequant-matmul for W4 decode
    GEMVs via `set_w4_backend`, and per-token int8 activation quant (W4A8 /
    W8A8-INT8, reference `layers/quantization/w8a8_int8.py`) via
    `set_act_quant`.

    ``layer``: traced layer index for STACKED [L, ...] quant weights — the
    trunk scan passes the whole stack so the Pallas kernels address the
    layer via scalar-prefetched index maps instead of consuming per-layer
    scan-xs slices (which materialize a full weight copy per layer per
    step — measured 2.6x the matmul cost, scripts/r5_probe_decode.py
    scanmm)."""
    if layer is not None and isinstance(w, QuantizedWeightW4) and w.q.ndim == 3:
        if _W4_BACKEND[0] == "pallas":
            from sglang_npu_tpu.ops.pallas.quant_matmul import (
                einsum_w4_stacked,
            )

            return einsum_w4_stacked(
                x, w, layer, eq, act=_ACT_QUANT[0] or "a16"
            )
        w = QuantizedWeightW4(
            q=w.q[layer], s=w.s[layer], b=w.b[layer],
            perm=None if w.perm is None else w.perm[layer],
        )
    elif (
        layer is not None
        and isinstance(w, QuantizedWeight)
        and w.q.ndim == 3
    ):
        if _W4_BACKEND[0] == "pallas" and w.q.dtype == jnp.int8:
            from sglang_npu_tpu.ops.pallas.quant_matmul import (
                einsum_w8_stacked,
                einsum_w8a8_stacked,
            )

            if _ACT_QUANT[0] == "a8":
                # int8 x int8 on the int8 MXU: zero per-weight VPU work
                return einsum_w8a8_stacked(x, w, layer, eq)
            return einsum_w8_stacked(x, w, layer, eq)
        w = QuantizedWeight(q=w.q[layer], s=w.s[layer])
    if isinstance(w, QuantizedWeightW4) and _W4_BACKEND[0] == "pallas":
        from sglang_npu_tpu.ops.pallas.quant_matmul import einsum_w4

        return einsum_w4(x, w, eq, act=_ACT_QUANT[0] or "a16")
    if isinstance(w, QuantizedWeight) and _ACT_QUANT[0] == "a8":
        return _einsum_w8a8(x, w, eq)
    if (
        isinstance(w, QuantizedWeight)
        and _W4_BACKEND[0] == "pallas"
        and w.q.ndim == 2
        and w.q.dtype == jnp.int8
    ):
        # weight-only int8: the Pallas dequant kernel converts in VMEM
        # (724 GB/s at the decode shape, scripts/bench_w8_probe.py; the
        # XLA dequant einsum materializes the bf16 weight in HBM).  fp8
        # stays on XLA — Mosaic's f8->bf16 convert measured 77 GB/s
        # (software-emulated on this stack).
        from sglang_npu_tpu.ops.pallas.quant_matmul import einsum_w8

        return einsum_w8(x, w, eq)
    if isinstance(w, QuantizedWeightW4) and _ACT_QUANT[0] == "a8":
        # XLA fallback for w4a8 (CPU tests / D-mismatch models): per-token
        # int8 activation quant against the dequantized weight — same
        # activation-quant numerics class as the int8-MXU Pallas kernel
        x32 = x.astype(jnp.float32)
        sx = (
            jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-9)
            / 127.0
        )
        xq = jnp.clip(jnp.round(x32 / sx), -127, 127)
        out = jnp.einsum(eq, xq.astype(x.dtype), dequant(w, x.dtype))
        return (out.astype(jnp.float32) * sx).astype(x.dtype)
    return jnp.einsum(eq, x, dequant(w, x.dtype))


def _einsum_w8a8(x: jax.Array, w: "QuantizedWeight", eq: str) -> jax.Array:
    """W8A8-INT8: per-token symmetric activation quant + int8 MXU dot
    (XLA lowers an int8xint8->int32 einsum straight onto the MXU at 2x the
    bf16 rate — the prefill-throughput lever; reference
    `w8a8_int8.py` / Ascend headline path)."""
    x32 = x.astype(jnp.float32)
    sx = (
        jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-9)
        / 127.0
    )
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    d = jnp.einsum(eq, xq, w.q, preferred_element_type=jnp.int32)
    # w.s is [..., 1, Out]; the contracted row dim drops from the output
    scale = jnp.squeeze(w.s, axis=-2)
    return (d.astype(jnp.float32) * sx * scale).astype(x.dtype)


_W4_BACKEND = ["xla"]
_ACT_QUANT = [None]  # None | "a8"


def set_w4_backend(name: str):
    assert name in ("xla", "pallas")
    _W4_BACKEND[0] = name


def set_act_quant(mode):
    """Activation compute mode: None (bf16 A16), 'a16x2' (A16 on the int8
    MXU via residual two-component decomposition — precision >= one bf16
    pass, speed = the W4 weight-DMA floor), or 'a8' (per-token int8)."""
    assert mode in (None, "a8", "a16x2")
    _ACT_QUANT[0] = mode


# weights quantized under --quantization int8/w4a16/fp8 (weight-only)
QUANT_LAYER_KEYS = (
    "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
    # MoE stacks (qwen-moe/mixtral: routed experts + shared expert)
    "e_gate", "e_up", "e_down", "s_gate", "s_up", "s_down",
)


def quantize_params_int8(params: dict) -> dict:
    """Quantize the per-layer matmul weights in a loaded param tree
    (device-side, jitted per leaf)."""

    @jax.jit
    def q8(w):
        w32 = w.astype(jnp.float32)
        s = jnp.max(jnp.abs(w32), axis=-2, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-10)
        q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
        return q, s

    layers = dict(params["layers"])
    n = 0
    for k in QUANT_LAYER_KEYS:
        if k in layers and not isinstance(
            layers[k], (QuantizedWeight, QuantizedWeightFP8Block)
        ):
            q, s = q8(layers[k])
            layers[k] = QuantizedWeight(q=q, s=s)
            n += 1
    out = dict(params)
    out["layers"] = layers
    logger.info("weight-only int8: quantized %d stacked weights", n)
    return out


def quantize_params_fp8(params: dict) -> dict:
    """Weight-only FP8 e4m3 with per-output-channel scale (reference
    `fp8.py` per-channel weight path)."""

    @jax.jit
    def qf8(w):
        w32 = w.astype(jnp.float32)
        s = jnp.max(jnp.abs(w32), axis=-2, keepdims=True) / 448.0
        s = jnp.maximum(s, 1e-10)
        q = (w32 / s).astype(jnp.float8_e4m3fn)
        return q, s

    layers = dict(params["layers"])
    n = 0
    for k in QUANT_LAYER_KEYS:
        if k in layers and not isinstance(
            layers[k], (QuantizedWeight, QuantizedWeightFP8, QuantizedWeightFP8Block)
        ):
            q, s = qf8(layers[k])
            layers[k] = QuantizedWeightFP8(q=q, s=s)
            n += 1
    out = dict(params)
    out["layers"] = layers
    logger.info("weight-only fp8: quantized %d stacked weights", n)
    return out


def quantize_params_w4(params: dict, group_size: int = 128) -> dict:
    """Round-to-nearest W4A16 grouped quantization of a bf16 param tree
    (calibration-free; AWQ/GPTQ checkpoints carry their own calibrated
    values and enter through `model_loader/quant_ingest.py`)."""

    @jax.jit
    def q4(w):
        w32 = w.astype(jnp.float32)
        K, N = w32.shape[-2], w32.shape[-1]
        lead = w32.shape[:-2]
        grp = w32.reshape(*lead, K // group_size, group_size, N)
        wmax = jnp.max(grp, axis=-2, keepdims=True)
        wmin = jnp.min(grp, axis=-2, keepdims=True)
        s = jnp.maximum((wmax - wmin) / 15.0, 1e-10)
        z = jnp.clip(jnp.round(-wmin / s), 0, 15)
        q = jnp.clip(jnp.round(grp / s + z), 0, 15).astype(jnp.uint8)
        q = q.reshape(*lead, K, N)
        b = (z * s)[..., 0, :]
        s = s[..., 0, :]
        return pack_w4(q, group_size), s, b

    layers = dict(params["layers"])
    n = 0
    for k in QUANT_LAYER_KEYS:
        w = layers.get(k)
        if w is None or isinstance(
            w,
            (
                QuantizedWeight,
                QuantizedWeightFP8,
                QuantizedWeightFP8Block,
                QuantizedWeightW4,
            ),
        ):
            continue
        if w.shape[-2] % group_size != 0:
            logger.warning("skipping w4 for %s: K=%d not divisible by group", k, w.shape[-2])
            continue
        packed, s, b = q4(w)
        layers[k] = QuantizedWeightW4(q=packed, s=s, b=b)
        n += 1
    out = dict(params)
    out["layers"] = layers
    logger.info("W4A16 RTN: quantized %d stacked weights (g=%d)", n, group_size)
    return out


def repack_w4_to_int8(params: dict) -> dict:
    """Serving-time repack of grouped W4 weights into per-output-channel
    INT8 (reference analogue: Marlin-style serving repacks of AWQ/GPTQ
    checkpoints).  Motivation (r5 measurements): the bf16-dequant W4
    kernel is VPU-bound at ~240-305 GB/s (mask+convert+mul per nibble)
    while int8 x int8 rides the int8 MXU with ZERO per-weight VPU work —
    for the per-token-int8-activation (w4a8) serving class the repack
    roughly doubles decode matmul bandwidth for 2x the weight bytes.

    Accuracy: the added error is <= s_max/254 per weight (half an int8
    step at the channel's amax); relative to a group's own W4 step s_g
    that is s_max/(254*s_g) — under 1/16 of a W4 LSB while group scales
    within a channel stay within ~16x.  The w4a8 class already quantizes
    activations to int8 per token, which dominates.  Validate with
    scripts/quant_accuracy_probe.py.
    """

    @jax.jit
    def r8(w: QuantizedWeightW4):
        g = w.group_size

        def one(qsb):
            q, s, b = qsb
            deq = dequant(
                QuantizedWeightW4(q=q, s=s, b=b), jnp.float32
            )  # [K, N]
            sc = jnp.maximum(
                jnp.max(jnp.abs(deq), axis=0, keepdims=True) / 127.0, 1e-10
            )
            q8 = jnp.clip(jnp.round(deq / sc), -127, 127).astype(jnp.int8)
            return q8, sc

        # sequential over layers: a whole-stack f32 dequant would not fit
        q8, sc = jax.lax.map(one, (w.q, w.s, w.b))
        return q8, sc

    layers = dict(params["layers"])
    n = 0
    for k, w in list(layers.items()):
        if isinstance(w, QuantizedWeightW4) and w.perm is None:
            q8, sc = r8(w)
            layers[k] = QuantizedWeight(q=q8, s=sc)
            n += 1
    out = dict(params)
    out["layers"] = layers
    logger.info("w4->int8 serving repack: %d stacked weights", n)
    return out


def merge_stacked_weights(layers: dict, groups) -> dict:
    """Load-time fusion of per-layer projections that share an input
    (reference `QKVParallelLinear` / `MergedColumnParallelLinear`,
    `srt/layers/linear.py:1`): concatenate stacked weights along the
    output dim so decode issues one wide matmul instead of 2-3 narrow
    ones (the Pallas W4 kernels and the XLA dequant dots both pay a fixed
    per-dispatch cost).  Only valid at tp=1 — the model splits the fused
    output at static offsets which must not cross shard boundaries.

    ``groups`` = ((merged_key, (src_key, ...)), ...).  Skips a group when
    keys are missing, dtypes/classes differ, or a GPTQ act-order perm is
    present (per-source activation permutations cannot share one dot).

    Returns ``(layers, manifest)`` where manifest maps each fused-away
    source key to ``(merged_key, col_offset, col_width)`` so live weight
    updates can still target the original projection
    (`model_runner.update_weights_from_tensor`)."""

    def cat(ws):
        w0 = ws[0]
        if all(isinstance(w, jax.Array) for w in ws):
            return jnp.concatenate(ws, axis=-1)
        if isinstance(w0, (QuantizedWeight, QuantizedWeightFP8)) and all(
            type(w) is type(w0) for w in ws
        ):
            return type(w0)(
                q=jnp.concatenate([w.q for w in ws], axis=-1),
                s=jnp.concatenate([w.s for w in ws], axis=-1),
            )
        if isinstance(w0, QuantizedWeightW4) and all(
            type(w) is type(w0)
            and w.perm is None
            and w.group_size == w0.group_size
            for w in ws
        ):
            return QuantizedWeightW4(
                q=jnp.concatenate([w.q for w in ws], axis=-1),
                s=jnp.concatenate([w.s for w in ws], axis=-1),
                b=jnp.concatenate([w.b for w in ws], axis=-1),
            )
        return None

    out = dict(layers)
    manifest = {}
    for merged_key, srcs in groups:
        if not all(k in out for k in srcs):
            continue
        m = cat([out[k] for k in srcs])
        if m is None:
            continue
        off = 0
        for k in srcs:
            w = out[k]
            width = (w.s if hasattr(w, "s") else w).shape[-1]
            manifest[k] = (merged_key, off, width)
            off += width
        out[merged_key] = m
        for k in srcs:
            del out[k]
        logger.info("fused %s <- %s", merged_key, "+".join(srcs))
    return out, manifest


def apply_quantization(params: dict, method: Optional[str], **kw) -> dict:
    if method in (None, "", "none"):
        return params
    if method in ("int8", "w8a16_int8", "w8a8_int8"):
        return quantize_params_int8(params)
    if method in ("fp8", "fp8_e4m3"):
        return quantize_params_fp8(params)
    if method in ("w4a16", "int4", "w4a8"):
        return quantize_params_w4(params, kw.get("group_size", 128))
    if method in (
        "awq", "gptq", "awq_marlin", "gptq_marlin",
        "compressed-tensors", "compressed_tensors",
    ):
        # checkpoint already carries quantized tensors; ingestion happened
        # in the loader
        return params
    raise ValueError(f"unknown quantization method {method}")
