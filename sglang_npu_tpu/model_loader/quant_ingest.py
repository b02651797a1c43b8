"""AWQ / GPTQ checkpoint ingestion.

Behavioral counterpart of the reference's
`layers/quantization/awq.py:1-771` (autoawq GEMM tensors) and `gptq.py`
(AutoGPTQ tensors): unpacks the int32 nibble-packed checkpoint tensors on
the host and re-packs them into this repo's TPU-friendly W4 layout
(`layers/quantization.QuantizedWeightW4`: in-group nibble pairs, scales
and zeros*scales per group).

Checkpoint tensor formats (per linear, HF weight [out=N, in=K] transposed
to our [K, N] convention):

  AWQ (autoawq "gemm"):
    qweight int32 [K, N/8]   nibble i -> out column 8*c + AWQ_ORDER[i]
    qzeros  int32 [K/g, N/8] same column packing
    scales  f16   [K/g, N]
    dequant: w = (q - z) * s

  GPTQ (AutoGPTQ):
    qweight int32 [K/8, N]   nibble i -> in row 8*r + i
    qzeros  int32 [K/g, N/8] sequential column packing, stores (z - 1)
                             (the classic AutoGPTQ convention; the
                             "gptq_v2" / sym format stores z directly)
    scales  f16   [K/g, N]
    g_idx   int32 [K]        group of each row (act-order when shuffled)
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7], dtype=np.int64)


def _unpack_cols(packed: np.ndarray) -> np.ndarray:
    """int32 [..., C] -> uint8 [..., C*8] nibbles in shift order."""
    p = packed.astype(np.uint32)
    out = np.empty(p.shape + (8,), dtype=np.uint8)
    for i in range(8):
        out[..., i] = (p >> (4 * i)) & 0xF
    return out.reshape(*p.shape[:-1], p.shape[-1] * 8)


def unpack_awq_tensor(packed: np.ndarray) -> np.ndarray:
    """AWQ column packing: [R, C] int32 -> [R, C*8] uint8 in true column
    order (undo the AWQ interleave)."""
    nibbles = _unpack_cols(packed).reshape(*packed.shape, 8)
    out = np.empty_like(nibbles)
    out[..., AWQ_ORDER] = nibbles
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 8)


def unpack_gptq_rows(packed: np.ndarray) -> np.ndarray:
    """GPTQ row packing: [R/8, N] int32 -> [R, N] uint8 sequential."""
    p = packed.astype(np.uint32)
    out = np.empty((p.shape[0], 8) + p.shape[1:], dtype=np.uint8)
    for i in range(8):
        out[:, i] = (p >> (4 * i)) & 0xF
    return out.reshape(p.shape[0] * 8, *p.shape[1:])


def unpack_gptq_cols(packed: np.ndarray) -> np.ndarray:
    """GPTQ qzeros column packing: [G, N/8] int32 -> [G, N] uint8."""
    return _unpack_cols(packed)


def awq_to_w4(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Returns (q4 [K, N] uint8, s [K/g, N] f32, b=z*s [K/g, N] f32, None)."""
    q4 = unpack_awq_tensor(qweight)  # [K, N]
    z = unpack_awq_tensor(qzeros).astype(np.float32)  # [K/g, N]
    s = scales.astype(np.float32)
    return q4, s, z * s, None


def gptq_to_w4(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: Optional[np.ndarray],
    v2: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Returns (q4 [K, N] uint8 in group-sorted row order, s, b, perm).

    perm is the activation gather (x_used[k] = x[perm[k]]); None when the
    checkpoint has no act-order."""
    q4 = unpack_gptq_rows(qweight)  # [K, N]
    z = unpack_gptq_cols(qzeros).astype(np.float32)
    if not v2:
        z = z + 1.0  # AutoGPTQ stores zero-1
    s = scales.astype(np.float32)
    K = q4.shape[0]
    G = s.shape[0]
    g = K // G
    perm = None
    if g_idx is not None:
        trivial = np.arange(K, dtype=np.int64) // g
        if not np.array_equal(g_idx.astype(np.int64), trivial):
            # act-order: sort rows by group so groups are contiguous
            perm = np.argsort(g_idx, kind="stable").astype(np.int32)
            q4 = q4[perm]
    return q4, s, z * s, perm


def ct_unpack_int32(packed: np.ndarray) -> np.ndarray:
    """compressed-tensors `pack_to_int32`: signed int4 values packed 8 per
    int32 along the LAST axis, LSB-first.  [N, K/8] int32 -> [N, K] int8
    signed values in [-8, 7]."""
    p = packed.astype(np.uint32)
    out = np.empty(p.shape + (8,), dtype=np.int8)
    for i in range(8):
        nib = ((p >> (4 * i)) & 0xF).astype(np.int8)
        out[..., i] = np.where(nib >= 8, nib - 16, nib)
    return out.reshape(*p.shape[:-1], p.shape[-1] * 8)


def ct_to_w4(
    weight_packed: np.ndarray,
    scales: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """compressed-tensors pack-quantized (symmetric int4, group strategy):
    HF-layout `weight_packed` [N, K/8] + scales already transposed to our
    [K/g, N] orientation by the loader ->
    (q4 [K, N] uint8 in [0,15], s [K/g, N], b=8*s, perm=None).

    w = q_signed * s with q_signed in [-8, 7]; our W4 convention stores
    q4 = q_signed + 8 with b = z*s at z = 8."""
    q_s = ct_unpack_int32(weight_packed).T  # [K, N] signed
    q4 = (q_s.astype(np.int16) + 8).astype(np.uint8)
    s = scales.astype(np.float32)
    return q4, s, 8.0 * s, None


def pack_w4_np(q4: np.ndarray, group_size: int) -> np.ndarray:
    """numpy twin of `layers.quantization.pack_w4` (host-side packing —
    never route checkpoint bytes through the device)."""
    K, N = q4.shape[-2], q4.shape[-1]
    g = group_size
    assert K % g == 0 and g % 2 == 0, (K, g)
    v = q4.astype(np.uint8).reshape(*q4.shape[:-2], K // g, g, N)
    lo = v[..., : g // 2, :]
    hi = v[..., g // 2 :, :] ^ 8  # xor8 convention — see layers.quantization.pack_w4
    return (lo | (hi << 4)).reshape(*q4.shape[:-2], K // 2, N)


def detect_quant_config(model_path: str) -> Optional[Dict]:
    """Read quantization metadata from config.json / quantize_config.json
    (reference quant detection in `configs/model_config.py`)."""
    import json
    import os

    cfg_path = os.path.join(model_path, "config.json")
    qcfg = None
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            qcfg = json.load(f).get("quantization_config")
    if qcfg is None:
        alt = os.path.join(model_path, "quantize_config.json")
        if os.path.exists(alt):
            with open(alt) as f:
                qcfg = json.load(f)
    if qcfg is None:
        return None
    method = (qcfg.get("quant_method") or "gptq").lower()
    if method in ("compressed-tensors", "compressed_tensors"):
        # llm-compressor checkpoints (reference
        # `layers/quantization/compressed_tensors/compressed_tensors.py`):
        # config_groups describe the weight/activation schemes; tensors are
        # `weight`(+`weight_scale`) for 8-bit or `weight_packed`(+scale,
        # shape) for pack-quantized 4-bit.
        wargs, aargs = None, None
        for grp in (qcfg.get("config_groups") or {}).values():
            if isinstance(grp, dict) and grp.get("weights"):
                wargs = grp["weights"]
                aargs = grp.get("input_activations")
                break
        wargs = wargs or {}
        return {
            "method": "compressed-tensors",
            "bits": int(wargs.get("num_bits", 8)),
            "group_size": int(wargs.get("group_size") or 128),
            "desc_act": False,
            "checkpoint_format": qcfg.get("format", ""),
            "sym": bool(wargs.get("symmetric", True)),
            "weight_block_size": None,
            "ct_type": (wargs.get("type") or "int").lower(),
            "ct_strategy": (wargs.get("strategy") or "channel").lower(),
            "ct_act_dynamic": bool(aargs and aargs.get("dynamic")),
            "ct_act_bits": int(aargs.get("num_bits", 8)) if aargs else None,
            "ct_act_type": (
                (aargs.get("type") or "int").lower() if aargs else None
            ),
            "ignore": qcfg.get("ignore") or [],
        }
    return {
        "method": method,
        "bits": int(qcfg.get("bits", qcfg.get("w_bit", 4))),
        "group_size": int(qcfg.get("group_size", qcfg.get("q_group_size", 128))),
        "desc_act": bool(qcfg.get("desc_act", False)),
        "checkpoint_format": qcfg.get("checkpoint_format", method),
        "sym": bool(qcfg.get("sym", False)),
        # native DeepSeek-V3/R1 blockwise FP8 (reference fp8.py): e.g.
        # {"quant_method": "fp8", "weight_block_size": [128, 128]}
        "weight_block_size": qcfg.get("weight_block_size"),
    }


def convert_quant_tensors(
    method: str,
    tensors: Dict[str, np.ndarray],
    v2: bool = False,
):
    """Dispatch one linear's quantized tensor set -> W4 pieces."""
    if method == "awq":
        return awq_to_w4(
            tensors["qweight"], tensors["qzeros"], tensors["scales"]
        )
    if method in ("gptq", "gptq_v2"):
        return gptq_to_w4(
            tensors["qweight"],
            tensors["qzeros"],
            tensors["scales"],
            tensors.get("g_idx"),
            v2=v2 or method == "gptq_v2",
        )
    if method == "compressed-tensors":
        return ct_to_w4(tensors["weight_packed"], tensors["scales"])
    raise ValueError(f"unsupported quant method {method}")
