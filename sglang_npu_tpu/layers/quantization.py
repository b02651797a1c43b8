"""Weight quantization.

Counterpart of the reference's `layers/quantization/` stack (w8a8_int8,
fp8, awq/gptq weight-only).  Round-1 scope: **weight-only INT8** with
per-output-channel symmetric scales — on TPU the int8->bf16 dequant fuses
into the matmul operand, so HBM weight traffic halves (decode is weight-
bandwidth-bound; this nearly doubles decode throughput per byte) and 8B
models fit one v5e chip.  W4 (AWQ/GPTQ ingestion) and activation quant are
the next rounds.
"""

from __future__ import annotations

import dataclasses
import logging

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


def dequant(w, dtype):
    if isinstance(w, QuantizedWeight):
        return (w.q.astype(dtype) * w.s.astype(dtype))
    return w


def matmul(x: jax.Array, w, eq: str) -> jax.Array:
    """einsum that transparently dequantizes QuantizedWeight operands; the
    convert+scale fuses into the dot's operand read."""
    return jnp.einsum(eq, x, dequant(w, x.dtype))


# weights quantized under --quantization int8 (weight-only)
QUANT_LAYER_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


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
        if k in layers and not isinstance(layers[k], QuantizedWeight):
            q, s = q8(layers[k])
            layers[k] = QuantizedWeight(q=q, s=s)
            n += 1
    out = dict(params)
    out["layers"] = layers
    logger.info("weight-only int8: quantized %d stacked weights", n)
    return out
