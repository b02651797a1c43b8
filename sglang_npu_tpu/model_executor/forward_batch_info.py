"""Device-side batch representation.

Counterpart of the reference's `srt/model_executor/forward_batch_info.py`
(`ForwardBatch:~240`, `ForwardMode:68`) re-designed for XLA: every field is a
*statically-shaped* jax array padded to a jit bucket; actual sizes travel as
device scalars (`seq_lens`, `extend_seq_lens`) so one compiled program
serves many real batch shapes — the TPU equivalent of the reference's
CUDA-graph padded replay (`cuda_graph_runner.py:711` `replay_prepare`).

Shapes (E = extend bucket, B = batch bucket, P = pages bucket):
  * extend:  rectangles [B, E] for tokens; page_tables [B, P]
  * decode:  vectors [B]; page_tables [B, P]

Padding conventions:
  * padded token slots write to page 0, the reserved garbage page
  * padded page-table entries point at page 0 (masked in attention)
  * padded batch rows have seq_len 0 -> fully masked, sampled tokens ignored
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_npu_tpu.managers.schedule_batch import ModelWorkerBatch


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ForwardBatch:
    """Statically-shaped device batch. All leaves are jnp arrays."""

    input_ids: jax.Array  # extend: [B, E] int32; decode: [B]
    positions: jax.Array  # same shape as input_ids
    out_slots: jax.Array  # same shape; KV slot each token writes
    page_tables: jax.Array  # [B, P] int32
    seq_lens: jax.Array  # [B] int32 (0 = padded row)
    extend_seq_lens: Optional[jax.Array]  # [B] int32 or None (decode)
    extend_prefix_lens: Optional[jax.Array]  # [B] int32 or None
    lora_ids: Optional[jax.Array] = None  # [B] int32 adapter slots (0 = none)
    # sliding-window models: [B, NW] physical page of each ring slot in the
    # window pool (see ops/hybrid_kv.py); None for full-attention models
    swa_page_tables: Optional[jax.Array] = None
    # multimodal (models/qwen2_5_vl.py): spliced image embeddings for the
    # extend region and the mask of which tokens they replace
    input_embeds: Optional[jax.Array] = None  # [B, E, D]
    embed_mask: Optional[jax.Array] = None  # [B, E] bool
    # mrope: [B, E, 3] (t, h, w) rope positions for extend; decode adds a
    # per-request delta to the sequential position instead
    mrope_positions: Optional[jax.Array] = None
    mrope_delta: Optional[jax.Array] = None  # [B] int32
    # gemma3-mm: image-group id per sequence position (-1 = text); query/
    # key pairs in the same group attend bidirectionally
    mm_groups: Optional[jax.Array] = None  # [B, P*page_size] int32
    # mllama-class cross-attention (models/mllama.py): per-request slot in
    # the cached vision K/V buffers (0 = the all-zeros no-image slot),
    # first-image position, and allowed/total vision token counts
    mm_slots: Optional[jax.Array] = None  # [B] int32
    mm_first_pos: Optional[jax.Array] = None  # [B] int32
    mm_vis_len: Optional[jax.Array] = None  # [B] int32
    mm_vis_total: Optional[jax.Array] = None  # [B] int32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplingDevice:
    temperatures: jax.Array  # [B]
    top_ks: jax.Array  # [B] int32
    top_ps: jax.Array  # [B]
    min_ps: jax.Array  # [B]
    # penalties (None when no request in the batch uses them)
    frequency_penalties: Optional[jax.Array] = None  # [B]
    presence_penalties: Optional[jax.Array] = None  # [B]
    repetition_penalties: Optional[jax.Array] = None  # [B]
    token_hist: Optional[jax.Array] = None  # [B, H] int32, -1 padded
    hist_is_output: Optional[jax.Array] = None  # [B, H] bool
    vocab_mask: Optional[jax.Array] = None  # [B, ceil(V/32)] uint32
    # min_new_tokens EOS/stop suppression
    min_new_remaining: Optional[jax.Array] = None  # [B] int32
    stop_mask_tokens: Optional[jax.Array] = None  # [B, S] int32, -1 padded
    # OpenAI logit_bias (sparse): ids padded with an out-of-vocab sentinel
    logit_bias_ids: Optional[jax.Array] = None  # [B, K] int32
    logit_bias_vals: Optional[jax.Array] = None  # [B, K] f32
    # custom logit processors: per-row processor slot (-1 = none) and the
    # batched params dict (sampling/custom_logit_processor.py); the static
    # processor-key tuple travels as a jit static arg, not here
    custom_slot: Optional[jax.Array] = None  # [B] int32
    custom_params: Optional[dict] = None  # key -> [B] / [B, K] arrays


def pad_to(arr: np.ndarray, size: int, fill=0, axis: int = 0) -> np.ndarray:
    pad = size - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill)


def _mm_arr(mwb, field, bs_bucket, fill):
    v = getattr(mwb, field, None)
    if v is None:
        return None
    import numpy as _np

    return jnp.asarray(pad_to(_np.asarray(v, _np.int32), bs_bucket, fill=fill))


def build_extend_forward_batch(
    mwb: ModelWorkerBatch,
    bs_bucket: int,
    extend_bucket: int,
    pages_bucket: int,
    page_size: int,
) -> ForwardBatch:
    """Pack a ragged extend batch into [B, E] rectangles (host numpy)."""
    B = len(mwb.seq_lens)
    ext = mwb.extend_seq_lens
    input_ids = np.zeros((bs_bucket, extend_bucket), dtype=np.int32)
    positions = np.zeros((bs_bucket, extend_bucket), dtype=np.int32)
    out_slots = np.zeros((bs_bucket, extend_bucket), dtype=np.int32)
    mrope = None
    if mwb.mrope_positions is not None:
        mrope = np.zeros((bs_bucket, extend_bucket, 3), dtype=np.int32)
    off = 0
    for i in range(B):
        n = int(ext[i])
        input_ids[i, :n] = mwb.input_ids[off : off + n]
        positions[i, :n] = mwb.positions[off : off + n]
        out_slots[i, :n] = mwb.out_slots[off : off + n]
        if mrope is not None:
            mrope[i, :n] = mwb.mrope_positions[off : off + n]
        off += n
    pt = pad_to(pad_to(mwb.page_tables, pages_bucket, axis=1), bs_bucket, axis=0)
    return ForwardBatch(
        input_ids=jnp.asarray(input_ids),
        positions=jnp.asarray(positions),
        out_slots=jnp.asarray(out_slots),
        page_tables=jnp.asarray(pt),
        seq_lens=jnp.asarray(pad_to(mwb.seq_lens, bs_bucket)),
        extend_seq_lens=jnp.asarray(pad_to(ext, bs_bucket)),
        extend_prefix_lens=jnp.asarray(pad_to(mwb.extend_prefix_lens, bs_bucket)),
        lora_ids=(
            jnp.asarray(pad_to(mwb.lora_ids, bs_bucket))
            if mwb.lora_ids is not None
            else None
        ),
        swa_page_tables=(
            jnp.asarray(pad_to(mwb.swa_page_tables, bs_bucket))
            if mwb.swa_page_tables is not None
            else None
        ),
        mrope_positions=jnp.asarray(mrope) if mrope is not None else None,
        mm_slots=_mm_arr(mwb, "mm_slots", bs_bucket, 0),
        mm_first_pos=_mm_arr(mwb, "mm_first_pos", bs_bucket, 1 << 30),
        mm_vis_len=_mm_arr(mwb, "mm_vis_len", bs_bucket, 0),
        mm_vis_total=_mm_arr(mwb, "mm_vis_total", bs_bucket, 0),
    )


def build_decode_forward_batch(
    mwb: ModelWorkerBatch,
    bs_bucket: int,
    pages_bucket: int,
) -> ForwardBatch:
    pt = pad_to(pad_to(mwb.page_tables, pages_bucket, axis=1), bs_bucket, axis=0)
    # decode is extend with E=1: rectangles [B, 1]
    slots0 = mwb.out_slots[:, 0] if mwb.out_slots.ndim == 2 else mwb.out_slots
    return ForwardBatch(
        input_ids=jnp.asarray(pad_to(mwb.input_ids, bs_bucket)[:, None]),
        positions=jnp.asarray(pad_to(mwb.positions, bs_bucket)[:, None]),
        out_slots=jnp.asarray(pad_to(slots0, bs_bucket)[:, None]),
        page_tables=jnp.asarray(pt),
        seq_lens=jnp.asarray(pad_to(mwb.seq_lens, bs_bucket)),
        extend_seq_lens=None,
        extend_prefix_lens=None,
        swa_page_tables=(
            jnp.asarray(pad_to(mwb.swa_page_tables, bs_bucket))
            if mwb.swa_page_tables is not None
            else None
        ),
        mrope_delta=(
            jnp.asarray(pad_to(mwb.mrope_delta, bs_bucket))
            if mwb.mrope_delta is not None
            else None
        ),
        mm_slots=_mm_arr(mwb, "mm_slots", bs_bucket, 0),
        mm_first_pos=_mm_arr(mwb, "mm_first_pos", bs_bucket, 1 << 30),
        mm_vis_len=_mm_arr(mwb, "mm_vis_len", bs_bucket, 0),
        mm_vis_total=_mm_arr(mwb, "mm_vis_total", bs_bucket, 0),
    )


def build_sampling_device(mwb: ModelWorkerBatch, bs_bucket: int) -> SamplingDevice:
    s = mwb.sampling_info
    out = SamplingDevice(
        temperatures=jnp.asarray(pad_to(s.temperatures, bs_bucket, fill=1.0)),
        top_ks=jnp.asarray(pad_to(s.top_ks, bs_bucket, fill=1)),
        top_ps=jnp.asarray(pad_to(s.top_ps, bs_bucket, fill=1.0)),
        min_ps=jnp.asarray(pad_to(s.min_ps, bs_bucket, fill=0.0)),
    )
    if s.has_penalties:
        out.frequency_penalties = jnp.asarray(
            pad_to(s.frequency_penalties, bs_bucket)
        )
        out.presence_penalties = jnp.asarray(
            pad_to(s.presence_penalties, bs_bucket)
        )
        out.repetition_penalties = jnp.asarray(
            pad_to(s.repetition_penalties, bs_bucket, fill=1.0)
        )
        out.token_hist = jnp.asarray(pad_to(s.token_hist, bs_bucket, fill=-1))
        out.hist_is_output = jnp.asarray(pad_to(s.hist_is_output, bs_bucket))
    if s.has_grammar and s.vocab_mask is not None:
        out.vocab_mask = jnp.asarray(
            pad_to(s.vocab_mask, bs_bucket, fill=np.uint32(0xFFFFFFFF))
        )
    if s.has_min_new:
        out.min_new_remaining = jnp.asarray(
            pad_to(s.min_new_remaining, bs_bucket)
        )
        out.stop_mask_tokens = jnp.asarray(
            pad_to(s.stop_mask_tokens, bs_bucket, fill=-1)
        )
    if s.has_logit_bias:
        out.logit_bias_ids = jnp.asarray(
            pad_to(s.logit_bias_ids, bs_bucket, fill=1 << 30)
        )
        out.logit_bias_vals = jnp.asarray(
            pad_to(s.logit_bias_vals, bs_bucket)
        )
    if s.custom_proc_keys:
        out.custom_slot = jnp.asarray(
            pad_to(s.custom_slot, bs_bucket, fill=-1)
        )
        out.custom_params = {
            k: jnp.asarray(pad_to(v, bs_bucket))
            for k, v in (s.custom_params or {}).items()
        }
    return out
