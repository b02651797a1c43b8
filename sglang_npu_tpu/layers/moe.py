"""Mixture-of-Experts layer (TPU-native grouped matmul).

Counterpart of the reference's `layers/moe/` stack (`topk.py`,
`fused_moe_triton/`, `ep_moe/layer.py`): token->expert routing with top-k
softmax, then a sort-based dropless grouped matmul built on
`jax.lax.ragged_dot` (the XLA op the MXU executes as a tiled grouped GEMM —
the role filled by the reference's fused_moe Triton kernels / DeepEP
dispatch).  Static shapes throughout: T*K assignment slots, argsort for
grouping — no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_routing(
    router_logits: jax.Array,  # [T, E]
    top_k: int,
    norm_topk_prob: bool = True,
    pre_softmax: bool = True,
):
    """Returns (weights [T, K] f32, expert_ids [T, K] i32)."""
    if pre_softmax:
        probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
        weights, ids = jax.lax.top_k(probs, top_k)
    else:
        logits_k, ids = jax.lax.top_k(router_logits.astype(jnp.float32), top_k)
        weights = jax.nn.softmax(logits_k, axis=-1)
    if norm_topk_prob:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, ids.astype(jnp.int32)


def moe_mlp(
    x: jax.Array,  # [T, Dm]
    router_w: jax.Array,  # [Dm, E]
    w_gate: jax.Array,  # [E, Dm, F]
    w_up: jax.Array,  # [E, Dm, F]
    w_down: jax.Array,  # [E, F, Dm]
    top_k: int,
    norm_topk_prob: bool = True,
) -> jax.Array:
    """Dropless top-k MoE: sort tokens by expert, grouped matmuls, unsort."""
    T, Dm = x.shape
    E = router_w.shape[-1]

    router_logits = jnp.einsum(
        "td,de->te", x, router_w, preferred_element_type=jnp.float32
    )
    weights, expert_ids = topk_routing(router_logits, top_k, norm_topk_prob)

    flat_experts = expert_ids.reshape(-1)  # [T*K]
    order = jnp.argsort(flat_experts)  # stable
    token_idx = order // top_k  # source token for each sorted slot
    sorted_x = x[token_idx]  # [T*K, Dm]
    group_sizes = jnp.bincount(flat_experts, length=E)

    gate = jax.lax.ragged_dot(sorted_x, w_gate, group_sizes)
    up = jax.lax.ragged_dot(sorted_x, w_up, group_sizes)
    act = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(
        x.dtype
    )
    out_sorted = jax.lax.ragged_dot(act, w_down, group_sizes)  # [T*K, Dm]

    out_flat = jnp.zeros((T * top_k, Dm), out_sorted.dtype).at[order].set(out_sorted)
    out = out_flat.reshape(T, top_k, Dm) * weights[..., None].astype(out_sorted.dtype)
    return out.sum(axis=1).astype(x.dtype)
