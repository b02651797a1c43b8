"""Quantized paged-KV pool for the Pallas kernels.

Counterpart of the reference's fp8/int8 KV cache
(`srt/mem_cache/memory_pool.py:162-305` set_kv_buffer scale/cast paths)
re-designed for TPU tiling rules:

  * data:  int8 / f8_e4m3 [L, 2, H, NP, ps, D] — same page layout as the
    bf16 pool, half/quarter the HBM traffic in the decode kernel.
  * scale: f32 [L, 2, NS, H, 128] with NS = ceil(NP/128): page p's
    per-head scale lives at [l, kv, p // 128, :, p % 128].  Packing 128
    pages per (8,128)-tile slab keeps every DMA whole-tile aligned (a
    per-page side array would pad each entry to a full 4KB tile), costs
    ~0.4% of pool memory, and each 4KB slab read covers 128 pages.

Scales are dynamic per (head, page): the kernels' write phases maintain
them with an in-place read-modify-write — when a new token's |max| grows
the page scale, the already-quantized rows are requantized in-kernel
(the page is already staged in VMEM for the insert).  Grid programs run
sequentially on the TPU core, so slab RMW across programs is race-free.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedQuantKV:
    data: jax.Array  # int8 | f8_e4m3 [L, 2, H, NP, ps, D]
    scale: jax.Array  # f32 [L, 2, NS, H, 128]

    @property
    def qmax(self) -> float:
        return 127.0 if self.data.dtype == jnp.int8 else 448.0


def scale_shape(num_layers: int, num_kv_heads: int, num_pages: int):
    ns = -(-num_pages // 128)
    return (num_layers, 2, ns, num_kv_heads, 128)


def dequant_rows(qkv: PagedQuantKV, pages, offs):
    """XLA gather of dequantized KV rows (HiCache backup / PD handoff):
    returns f32 [L, 2, H, n, D]."""
    rows = qkv.data[:, :, :, pages, offs].astype(jnp.float32)
    # separated advanced indices (dims 2 and 4) land in front: [n, L, 2, H]
    s = qkv.scale[:, :, pages // 128, :, pages % 128]
    s = jnp.moveaxis(s, 0, -1)  # [L, 2, H, n]
    return rows * s[..., None]


def quant_store_rows(qkv: PagedQuantKV, pages, offs, vals) -> PagedQuantKV:
    """XLA scatter of rows with fresh per-(head, page) scales.

    Correct when the written rows are the only live content of their
    pages (HiCache restore and PD decode-injection write whole
    page-aligned prefixes into freshly-allocated pages).  NOTE: this is
    an XLA scatter — only use it OUTSIDE jit regions that also pass the
    pool to a pallas_call (relayout hazard, see decode_kernel.py)."""
    vals = vals.astype(jnp.float32)  # [L, 2, H, n, D]
    # per (l, kv, h, page) amax over the rows written to that page
    amax_rows = jnp.max(jnp.abs(vals), axis=-1)  # [L, 2, H, n]
    # segment-max by page: scatter-max into the slab layout; separated
    # advanced indices (dims 2 and 4) index a [n, L, 2, H] view
    sg, sl = pages // 128, pages % 128
    new_scale = jnp.zeros_like(qkv.scale)
    new_scale = new_scale.at[:, :, sg, :, sl].max(
        jnp.moveaxis(amax_rows, -1, 0) / qkv.qmax
    )
    scale = jnp.maximum(qkv.scale, new_scale)
    row_scale = jnp.moveaxis(scale[:, :, sg, :, sl], 0, -1)  # [L, 2, H, n]
    q = vals / jnp.maximum(row_scale[..., None], 1e-8)
    if qkv.data.dtype == jnp.int8:
        q = jnp.clip(jnp.round(q), -127, 127)
    data = qkv.data.at[:, :, :, pages, offs].set(q.astype(qkv.data.dtype))
    return PagedQuantKV(data=data, scale=scale)
