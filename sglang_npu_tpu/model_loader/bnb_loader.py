"""bitsandbytes (bnb) 4-bit checkpoint ingestion.

Behavioral counterpart of the reference's `BitsAndBytesModelLoader`
(`srt/model_loader/loader.py:765-1200`): loads checkpoints whose linears
were quantized with bitsandbytes NF4/FP4 (QLoRA-style `load_in_4bit`
exports).  The reference keeps the 4-bit blocks on-device and matmuls with
bnb CUDA kernels; on TPU we dequantize on the host at load time into the
model dtype — the serving-time memory/bandwidth ladder is this repo's own
W4/INT8/FP8 path (`--quantization`), which can re-quantize the dequantized
weights uniformly.

Checkpoint format (bitsandbytes `QuantState.as_dict(packed=True)`):
  <name>.weight                       uint8 [numel/2, 1] two 4-bit codes
                                      per byte, first element in the HIGH
                                      nibble
  <name>.weight.absmax               per-block scale; f32, or uint8 when
                                      double-quantized
  <name>.weight.quant_map            16-entry f32 codebook (nf4/fp4)
  <name>.weight.nested_absmax        f32 per-block scale of the absmax
  <name>.weight.nested_quant_map     256-entry f32 codebook for absmax
  <name>.weight.quant_state.bitsandbytes__{nf4,fp4}
                                      uint8 bytes of a JSON dict:
                                      blocksize/shape/dtype/quant_type
                                      [+ nested_blocksize/nested_offset]
"""

from __future__ import annotations

import json
import logging
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)

# tensor-key suffixes that belong to a quantized <name>.weight
BNB_SIDECAR_SUFFIXES = (
    "absmax",
    "quant_map",
    "nested_absmax",
    "nested_quant_map",
    "quant_state.bitsandbytes__nf4",
    "quant_state.bitsandbytes__fp4",
)

# fallback codebooks when the checkpoint omits quant_map (bitsandbytes
# functional.py constants)
NF4_CODE = np.array(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    dtype=np.float32,
)
FP4_CODE = np.array(
    [
        0.0, 0.0052083333, 0.6666666667, 1.0, 0.3333333333, 0.5,
        0.1666666667, 0.25, -0.0, -0.0052083333, -0.6666666667, -1.0,
        -0.3333333333, -0.5, -0.1666666667, -0.25,
    ],
    dtype=np.float32,
)


def split_bnb_key(name: str) -> Optional[tuple]:
    """``model...weight.absmax`` -> (``model...weight``, ``absmax``)."""
    for suf in BNB_SIDECAR_SUFFIXES:
        tail = ".weight." + suf
        if name.endswith(tail):
            return name[: -len(tail)] + ".weight", suf
    return None


def parse_quant_state(raw: np.ndarray) -> Dict[str, Any]:
    """Decode the serialized-JSON quant_state tensor."""
    data = bytes(np.asarray(raw, dtype=np.uint8).reshape(-1).tolist())
    return json.loads(data.decode("utf-8"))


def _dequant_absmax(entry: Dict[str, np.ndarray], state: Dict[str, Any]) -> np.ndarray:
    """absmax tensor -> f32 per-block scales (undo double quantization)."""
    absmax = entry["absmax"]
    if absmax.dtype != np.uint8:
        return absmax.astype(np.float32).reshape(-1)
    # double-quantized: 8-bit codes into nested_quant_map, blockwise scaled
    codes = absmax.reshape(-1)
    cmap = entry["nested_quant_map"].astype(np.float32).reshape(-1)
    nabs = entry["nested_absmax"].astype(np.float32).reshape(-1)
    bs = int(state.get("nested_blocksize", 256))
    vals = cmap[codes]
    nblocks = -(-len(vals) // bs)
    scale = np.repeat(nabs[:nblocks], bs)[: len(vals)]
    offset = float(state.get("nested_offset", 0.0))
    return vals * scale + offset


def dequantize_bnb_tensor(entry: Dict[str, np.ndarray]) -> np.ndarray:
    """One linear's packed weight + sidecars -> dense f32 [out, in]."""
    state_raw = entry.get("quant_state.bitsandbytes__nf4")
    quant_type = "nf4"
    if state_raw is None:
        state_raw = entry.get("quant_state.bitsandbytes__fp4")
        quant_type = "fp4"
    state = parse_quant_state(state_raw) if state_raw is not None else {}
    quant_type = state.get("quant_type", quant_type)
    blocksize = int(state.get("blocksize", 64))
    shape = state.get("shape")
    packed = entry["weight"].reshape(-1).astype(np.uint8)
    # two codes per byte, first value in the high nibble
    codes = np.empty(packed.size * 2, dtype=np.uint8)
    codes[0::2] = packed >> 4
    codes[1::2] = packed & 0xF
    cmap = entry.get("quant_map")
    if cmap is None:
        cmap = NF4_CODE if quant_type == "nf4" else FP4_CODE
    cmap = cmap.astype(np.float32).reshape(-1)
    vals = cmap[codes]
    absmax = _dequant_absmax(entry, state)
    scale = np.repeat(absmax, blocksize)[: len(vals)]
    out = vals * scale
    if shape is not None:
        n = int(np.prod(shape))
        out = out[:n].reshape(shape)
    return out


def is_bnb_quant_config(qcfg: Optional[dict]) -> bool:
    return bool(qcfg) and qcfg.get("method") == "bitsandbytes"
