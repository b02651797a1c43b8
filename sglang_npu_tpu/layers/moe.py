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

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


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


def moe_mlp_ep(
    x: jax.Array,  # [T, Dm] (replicated)
    router_w: jax.Array,  # [Dm, E] (replicated)
    w_gate: jax.Array,  # [E, Dm, F] sharded on E over `axis`
    w_up: jax.Array,
    w_down: jax.Array,  # [E, F, Dm]
    top_k: int,
    norm_topk_prob: bool,
    mesh,
    axis: str = "model",
) -> jax.Array:
    """Expert-parallel MoE: the TPU-native replacement for the reference's
    EP dispatch stack (`layers/moe/token_dispatcher/deepep.py`,
    `ep_moe/layer.py`).  Instead of an all-to-all token shuffle, expert
    weights shard over the mesh axis on their EXPERT dim and every device
    computes its local experts' contribution for the full (replicated)
    token set inside a `shard_map` island; one `psum` of [T, Dm] combines
    them.  Weight memory and HBM weight streaming divide by ep_size —
    the quantity that bounds MoE decode — while the only collective is a
    single ICI all-reduce (same cost class as a TP matmul reduction).
    Routing runs identically on every device (replicated), so there is no
    capacity factor and no token dropping."""
    E = router_w.shape[-1]
    ep = mesh.shape[axis]
    assert E % ep == 0, f"{E} experts not divisible by ep={ep}"

    def local_fn(x, router_w, wg, wu, wd):
        T, Dm = x.shape
        E_local = wg.shape[0]
        lo = jax.lax.axis_index(axis) * E_local
        logits = jnp.einsum(
            "td,de->te", x, router_w, preferred_element_type=jnp.float32
        )
        weights, expert_ids = topk_routing(logits, top_k, norm_topk_prob)
        rel = expert_ids - lo
        local = (rel >= 0) & (rel < E_local)
        # non-local assignments sort past the last group -> zero rows
        flat = jnp.where(local, rel, E_local).reshape(-1)
        order = jnp.argsort(flat)
        token_idx = order // top_k
        sorted_x = x[token_idx]
        group_sizes = jnp.bincount(flat, length=E_local)

        gate = jax.lax.ragged_dot(sorted_x, wg, group_sizes)
        up = jax.lax.ragged_dot(sorted_x, wu, group_sizes)
        act = (
            jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
        ).astype(x.dtype)
        out_sorted = jax.lax.ragged_dot(act, wd, group_sizes)

        out_flat = (
            jnp.zeros((T * top_k, Dm), out_sorted.dtype)
            .at[order]
            .set(out_sorted)
        )
        w_eff = jnp.where(local, weights, 0.0).astype(out_sorted.dtype)
        out = (out_flat.reshape(T, top_k, Dm) * w_eff[..., None]).sum(axis=1)
        return jax.lax.psum(out.astype(x.dtype), axis)

    wspec = P(axis, *([None] * (w_gate.ndim - 1)))
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), wspec, wspec, wspec),
        out_specs=P(),
        check_vma=False,
    )(x, router_w, w_gate, w_up, w_down)
