"""On-device sampling (greedy / temperature / top-k / top-p / min-p).

Counterpart of the reference's `srt/layers/sampler.py` (`Sampler:29`) and the
sgl-kernel sampling ops (`common_extension.cc:314-333`): on TPU the whole
sampling pipeline is a fused jit region — sort-based joint top-k/top-p/min-p
filtering followed by Gumbel-max sampling, so no host round-trip happens
between logits and token ids.

Three entry points of increasing cost; the ModelRunner picks per batch based
on the host-side sampling info (this is a *trace-time* decision, giving three
compiled variants instead of runtime branches):
  * sample_greedy:  argmax
  * sample_simple:  temperature-only Gumbel sampling
  * sample_full:    temperature + top-k/top-p/min-p via full-vocab sort
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sglang_npu_tpu.model_executor.forward_batch_info import SamplingDevice

NEG_INF = -1e10


def sample_greedy(logits: jax.Array, sampling: SamplingDevice, rng) -> jax.Array:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _gumbel(rng, shape):
    u = jax.random.uniform(rng, shape, minval=1e-20, maxval=1.0)
    return -jnp.log(-jnp.log(u))


def _temperature_scale(logits, temperatures):
    t = temperatures[:, None]
    safe_t = jnp.where(t <= 0.0, 1.0, t)
    return logits / safe_t


def sample_simple(logits: jax.Array, sampling: SamplingDevice, rng) -> jax.Array:
    scaled = _temperature_scale(logits, sampling.temperatures)
    noisy = scaled + _gumbel(rng, logits.shape)
    sampled = jnp.argmax(noisy, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    is_greedy = sampling.temperatures[:] <= 0.0
    return jnp.where(is_greedy, greedy, sampled).astype(jnp.int32)


def sample_full(logits: jax.Array, sampling: SamplingDevice, rng) -> jax.Array:
    """Joint top-k / top-p / min-p filtering (matches the reference's
    flashinfer/torch sampling semantics), then Gumbel-max."""
    B, V = logits.shape
    scaled = _temperature_scale(logits, sampling.temperatures)

    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]  # desc
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cumsum = jnp.cumsum(probs, axis=-1)

    ranks = jnp.arange(V, dtype=jnp.int32)[None, :]
    keep_topk = ranks < sampling.top_ks[:, None]
    # top-p: keep the smallest prefix whose mass >= top_p (always keep 1st)
    keep_topp = (cumsum - probs) < sampling.top_ps[:, None]
    keep_minp = probs >= sampling.min_ps[:, None] * probs[:, :1]
    keep = keep_topk & keep_topp & keep_minp
    keep = keep.at[:, 0].set(True)

    # threshold = smallest kept logit; then filter original layout
    kept_logits = jnp.where(keep, sorted_logits, jnp.inf)
    threshold = jnp.min(kept_logits, axis=-1, keepdims=True)
    filtered = jnp.where(scaled >= threshold, scaled, NEG_INF)

    noisy = filtered + _gumbel(rng, logits.shape)
    sampled = jnp.argmax(noisy, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    is_greedy = sampling.temperatures[:] <= 0.0
    return jnp.where(is_greedy, greedy, sampled).astype(jnp.int32)


# ----------------------------------------------------------------------
# Penalties (reference `sampling/penaltylib/`: frequency/presence
# orchestrators keep [B, vocab] cumulative tensors on device; here the
# counts are rebuilt from token history inside the jit and updated
# on-device across fused decode steps).
# ----------------------------------------------------------------------
def build_penalty_counts(sampling: SamplingDevice, vocab: int):
    """Returns (counts_out [B,V] f32, counts_all [B,V] f32)."""
    hist = sampling.token_hist
    B, H = hist.shape
    b_idx = jnp.arange(B)[:, None]
    safe = jnp.where(hist < 0, vocab, hist)  # OOB -> dropped
    valid = (hist >= 0).astype(jnp.float32)
    out_f = jnp.where(sampling.hist_is_output, valid, 0.0)
    counts_out = jnp.zeros((B, vocab), jnp.float32).at[b_idx, safe].add(
        out_f, mode="drop"
    )
    counts_all = jnp.zeros((B, vocab), jnp.float32).at[b_idx, safe].add(
        valid, mode="drop"
    )
    return counts_out, counts_all


def apply_penalties(
    logits: jax.Array, sampling: SamplingDevice, counts_out, counts_all
) -> jax.Array:
    seen = counts_all > 0
    rep = sampling.repetition_penalties[:, None]
    pos = logits > 0
    logits = jnp.where(seen, jnp.where(pos, logits / rep, logits * rep), logits)
    logits = (
        logits
        - sampling.frequency_penalties[:, None] * counts_out
        - sampling.presence_penalties[:, None] * (counts_out > 0)
    )
    return logits


def update_penalty_counts(counts_out, counts_all, tokens, active):
    """Account tokens sampled on-device within a fused decode window."""
    B = tokens.shape[0]
    b_idx = jnp.arange(B)
    inc = active.astype(jnp.float32)
    counts_out = counts_out.at[b_idx, tokens].add(inc, mode="drop")
    counts_all = counts_all.at[b_idx, tokens].add(inc, mode="drop")
    return counts_out, counts_all


def apply_logit_bias(logits: jax.Array, sampling: SamplingDevice) -> jax.Array:
    """OpenAI logit_bias: sparse per-request (token, bias) scatter-add
    (reference sampling_batch_info logit_bias tensor; kept sparse here —
    a dense [B, V] bias would not fit the narrow host link)."""
    B = logits.shape[0]
    return logits.at[
        jnp.arange(B)[:, None], sampling.logit_bias_ids
    ].add(sampling.logit_bias_vals, mode="drop")


def apply_min_new_tokens(
    logits: jax.Array, sampling: SamplingDevice, step_idx
) -> jax.Array:
    """Mask EOS/stop-token logits for rows that have not yet produced
    min_new_tokens outputs (reference `penaltylib/min_new_tokens.py`).
    ``step_idx`` is the 0-based step within a fused decode window so the
    mask lifts on-device as the window progresses."""
    B, V = logits.shape
    toks = sampling.stop_mask_tokens  # [B, S], -1 padded
    active = step_idx < sampling.min_new_remaining  # [B]
    safe = jnp.where(toks >= 0, toks, V)  # padding scatters out of bounds
    hit = (
        jnp.zeros((B, V), jnp.float32)
        .at[jnp.arange(B)[:, None], safe]
        .add(1.0, mode="drop")
    ) > 0
    return jnp.where(hit & active[:, None], NEG_INF, logits)


def compute_token_logprobs(logits: jax.Array, token_ids: jax.Array) -> jax.Array:
    """Log-softmax probability of chosen tokens; [B]."""
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logprobs, token_ids[:, None], axis=-1)[:, 0]


def apply_packed_vocab_mask(logits: jax.Array, packed: jax.Array) -> jax.Array:
    """Apply a packed uint32 allowed-token bitmask [B, ceil(V/32)] (grammar
    constrained decoding — the one-op TPU version of the reference's
    `apply_token_bitmask_inplace_cuda.cu`)."""
    V = logits.shape[-1]
    idx = jnp.arange(V, dtype=jnp.int32)
    words = jnp.take_along_axis(
        packed, jnp.broadcast_to(idx >> 5, (packed.shape[0], V)), axis=1
    )
    bits = (words >> (idx & 31).astype(jnp.uint32)) & 1
    return jnp.where(bits.astype(bool), logits, NEG_INF)
