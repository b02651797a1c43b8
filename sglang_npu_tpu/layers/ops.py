"""Core numerical layer ops (functional, shape-polymorphic over [..., D]).

Counterpart of the reference's `srt/layers/layernorm.py`, `activation.py`,
`rotary_embedding.py`.  On TPU these stay as plain jnp expressions — XLA
fuses elementwise chains into the surrounding matmuls; Pallas is reserved
for the ops XLA cannot fuse well (paged attention, quantized matmul).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm in f32 accumulation (matches HF Llama semantics)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)


def silu_and_mul(gate_up: jax.Array) -> jax.Array:
    """SwiGLU activation on a fused [..., 2F] gate_up projection."""
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.silu(gate) * up


def gelu_and_mul(gate_up: jax.Array) -> jax.Array:
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.gelu(gate, approximate=True) * up


# ----------------------------------------------------------------------
# Rotary position embeddings
# ----------------------------------------------------------------------
def make_rope_tables(
    head_dim: int,
    max_position: int,
    rope_theta: float = 10000.0,
    rope_scaling: dict | None = None,
    dtype=jnp.float32,
):
    """Precompute cos/sin tables [max_position, head_dim//2].

    Supports the HF `rope_scaling` variants used by the reference's model
    zoo (`srt/layers/rotary_embedding.py`): llama3, linear, dynamic-ntk,
    yarn (approximate).
    """
    import numpy as np

    half = head_dim // 2
    inv_freq = 1.0 / (rope_theta ** (np.arange(0, half, dtype=np.float64) / half))
    mscale = 1.0  # yarn attention factor folded into cos/sin

    if rope_scaling:
        rtype = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
        if rtype == "llama3":
            factor = rope_scaling["factor"]
            low = rope_scaling.get("low_freq_factor", 1.0)
            high = rope_scaling.get("high_freq_factor", 4.0)
            orig = rope_scaling.get("original_max_position_embeddings", 8192)
            wavelen = 2 * np.pi / inv_freq
            low_wl = orig / low
            high_wl = orig / high
            scaled = np.where(wavelen > low_wl, inv_freq / factor, inv_freq)
            smooth = (orig / wavelen - low) / (high - low)
            mid = (1 - smooth) * inv_freq / factor + smooth * inv_freq
            is_mid = (wavelen <= low_wl) & (wavelen >= high_wl)
            inv_freq = np.where(is_mid, mid, scaled)
        elif rtype == "linear":
            inv_freq = inv_freq / rope_scaling["factor"]
        elif rtype == "yarn":
            # Exact HF yarn (`modeling_rope_utils._compute_yarn_parameters`):
            # per-dim blend of interpolated and extrapolated frequencies via
            # a linear ramp between the beta-derived correction dims, plus
            # the attention (mscale) factor folded into cos/sin.
            factor = rope_scaling.get("factor", 1.0)
            orig = rope_scaling.get(
                "original_max_position_embeddings", max_position
            )
            beta_fast = rope_scaling.get("beta_fast", 32.0)
            beta_slow = rope_scaling.get("beta_slow", 1.0)
            truncate = rope_scaling.get("truncate", True)
            attn_factor = rope_scaling.get("attention_factor")
            if attn_factor is None:
                attn_factor = 0.1 * np.log(factor) + 1.0
            dim = head_dim

            def corr_dim(num_rot):
                return (
                    dim * np.log(orig / (num_rot * 2 * np.pi))
                ) / (2 * np.log(rope_theta))

            low, high = corr_dim(beta_fast), corr_dim(beta_slow)
            if truncate:
                low, high = np.floor(low), np.ceil(high)
            low = max(low, 0.0)
            high = min(high, dim - 1.0)
            ramp = np.clip(
                (np.arange(half, dtype=np.float64) - low)
                / max(high - low, 1e-3),
                0.0, 1.0,
            )
            extrap_factor = 1.0 - ramp
            inv_freq = (
                inv_freq / factor * (1.0 - extrap_factor)
                + inv_freq * extrap_factor
            )
            mscale = float(attn_factor)
        elif rtype == "dynamic":
            # Approximate: NTK-style base rescale.
            factor = rope_scaling.get("factor", 1.0)
            base = rope_theta * factor ** (half / max(half - 2, 1))
            inv_freq = 1.0 / (base ** (np.arange(0, half, dtype=np.float64) / half))
        elif rtype in ("default", "mrope", ""):
            pass

    t = np.arange(max_position, dtype=np.float64)
    freqs = np.outer(t, inv_freq)
    return {
        "cos": jnp.asarray(np.cos(freqs) * mscale, dtype=dtype),
        "sin": jnp.asarray(np.sin(freqs) * mscale, dtype=dtype),
    }


def apply_rope(
    q: jax.Array,  # [..., H, D]
    k: jax.Array,  # [..., H_kv, D]
    positions: jax.Array,  # [...] int32, broadcastable to leading dims
    rope: dict,
):
    """Apply rotary embedding with NEOX-style (half-split) layout, matching
    HF Llama/Qwen."""
    cos = rope["cos"][positions]  # [..., D/2]
    sin = rope["sin"][positions]
    return apply_rope_cs(q, k, cos, sin)


def apply_rope_cs(q, k, cos, sin):
    """Rotary with precomputed per-token cos/sin [..., D/2] (used directly
    by mrope, which gathers sections from different position rows)."""
    cos = cos[..., None, :]  # broadcast over head axis
    sin = sin[..., None, :]

    def rot(x):
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        x1, x2 = jnp.split(x32, 2, axis=-1)
        out1 = x1 * cos - x2 * sin
        out2 = x2 * cos + x1 * sin
        return jnp.concatenate([out1, out2], axis=-1).astype(dtype)

    return rot(q), rot(k)
