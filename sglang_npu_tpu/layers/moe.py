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


def sigmoid_group_topk_routing(
    router_logits: jax.Array,  # [T, E] (f32 recommended)
    bias: jax.Array,  # [E] e_score_correction_bias
    top_k: int,
    n_group: int = 1,
    topk_group: int = 1,
    norm_topk_prob: bool = True,
    routed_scaling: float = 1.0,
):
    """DeepSeek-V3 / GLM-4-MoE "noaux_tc" routing (reference
    `Glm4MoeTopkRouter.forward` / deepseek_v2.py noaux path): sigmoid
    scores; expert selection adds a learned correction bias and first
    restricts to the ``topk_group`` best expert groups (group score = sum
    of its top-2 member scores); the combine WEIGHTS use the unbiased
    sigmoid scores.  Returns (weights [T,K] f32, ids [T,K] i32).

    Tie-break caveat: when fewer than ``top_k`` in-group choice scores are
    positive, the reference's masked-fill produces exact 0.0 ties whose
    topk order torch leaves unspecified; XLA breaks ties by lowest index,
    so selections can differ on that pathological case only."""
    T, E = router_logits.shape
    scores = jax.nn.sigmoid(router_logits.astype(jnp.float32))
    choice = scores + bias.astype(jnp.float32)[None, :]
    if n_group > 1:
        g = choice.reshape(T, n_group, E // n_group)
        group_scores = jax.lax.top_k(g, 2)[0].sum(-1)  # [T, G]
        _, gidx = jax.lax.top_k(group_scores, topk_group)
        gmask = jnp.zeros((T, n_group), jnp.bool_).at[
            jnp.arange(T)[:, None], gidx
        ].set(True)
        choice = jnp.where(
            jnp.repeat(gmask, E // n_group, axis=1), choice, 0.0
        )
    _, ids = jax.lax.top_k(choice, top_k)
    weights = jnp.take_along_axis(scores, ids, axis=1)
    if norm_topk_prob:
        weights = weights / (weights.sum(-1, keepdims=True) + 1e-20)
    weights = weights * routed_scaling
    return weights, ids.astype(jnp.int32)


def routing_counts(
    expert_ids: jax.Array,  # [T, K] i32 logical expert ids
    num_experts: int,
    mask: jax.Array | None = None,  # [T] true = count this token
) -> jax.Array:
    """Tokens routed per logical expert — the expert-distribution recorder
    feed (reference `srt/eplb/expert_distribution.py`).  ``mask`` excludes
    padded batch rows so bucket padding cannot skew EPLB load stats."""
    flat = expert_ids.reshape(-1)
    if mask is None:
        return jnp.bincount(flat, length=num_experts).astype(jnp.int32)
    w = jnp.repeat(mask.astype(jnp.int32), expert_ids.shape[-1])
    return jnp.bincount(flat, weights=w, length=num_experts).astype(jnp.int32)


def moe_mlp(
    x: jax.Array,  # [T, Dm]
    router_w: jax.Array,  # [Dm, E]
    w_gate: jax.Array,  # [E, Dm, F]
    w_up: jax.Array,  # [E, Dm, F]
    w_down: jax.Array,  # [E, F, Dm]
    top_k: int,
    norm_topk_prob: bool = True,
    collect_stats: bool = False,
    stats_mask: jax.Array | None = None,  # [T]
    activation: str = "silu",
    router_softcap: float = 0.0,  # grok-1: 30*tanh(logits/30) before topk
):
    """Dropless top-k MoE: sort tokens by expert, grouped matmuls, unsort.

    With ``collect_stats`` returns ``(out, counts[E] i32)`` — tokens routed
    per logical expert this call (the expert-distribution recorder feed,
    reference `srt/eplb/expert_distribution.py`)."""
    T, Dm = x.shape
    E = router_w.shape[-1]

    router_logits = jnp.einsum(
        "td,de->te", x, router_w, preferred_element_type=jnp.float32
    )
    if router_softcap > 0:
        router_logits = router_softcap * jnp.tanh(
            router_logits / router_softcap
        )
    weights, expert_ids = topk_routing(router_logits, top_k, norm_topk_prob)
    stats = (
        routing_counts(expert_ids, E, stats_mask) if collect_stats else None
    )

    out = moe_apply(
        x, w_gate, w_up, w_down, weights, expert_ids, activation=activation
    )
    return (out, stats) if collect_stats else out


def moe_apply(
    x: jax.Array,  # [T, Dm]
    w_gate: jax.Array,  # [E, Dm, F]
    w_up: jax.Array,
    w_down: jax.Array,  # [E, F, Dm]
    weights: jax.Array,  # [T, K] combine weights
    expert_ids: jax.Array,  # [T, K] i32
    activation: str = "silu",
) -> jax.Array:
    """Dropless grouped-GEMM compute for precomputed routing: sort tokens
    by expert, `lax.ragged_dot` the groups, unsort, weighted combine."""
    T, Dm = x.shape
    E = w_gate.shape[0]
    top_k = expert_ids.shape[-1]

    flat_experts = expert_ids.reshape(-1)  # [T*K]
    order = jnp.argsort(flat_experts)  # stable
    token_idx = order // top_k  # source token for each sorted slot
    sorted_x = x[token_idx]  # [T*K, Dm]
    group_sizes = jnp.bincount(flat_experts, length=E)

    gate = jax.lax.ragged_dot(sorted_x, w_gate, group_sizes)
    up = jax.lax.ragged_dot(sorted_x, w_up, group_sizes)
    act_fn = (
        jax.nn.silu
        if activation == "silu"
        else functools.partial(jax.nn.gelu, approximate=False)
    )
    act = (act_fn(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(
        x.dtype
    )
    out_sorted = jax.lax.ragged_dot(act, w_down, group_sizes)  # [T*K, Dm]

    out_flat = jnp.zeros((T * top_k, Dm), out_sorted.dtype).at[order].set(out_sorted)
    out = out_flat.reshape(T, top_k, Dm) * weights[..., None].astype(out_sorted.dtype)
    return out.sum(axis=1).astype(x.dtype)


def moe_mlp_ep(
    x: jax.Array,  # [T, Dm] (replicated)
    router_w: jax.Array,  # [Dm, E] (replicated)
    w_gate: jax.Array,  # [P, Dm, F] sharded on the physical-slot dim
    w_up: jax.Array,
    w_down: jax.Array,  # [P, F, Dm]
    top_k: int,
    norm_topk_prob: bool,
    mesh,
    axis: str = "model",
    l2p: jax.Array | None = None,  # [E, R] logical -> physical replicas
    rc: jax.Array | None = None,  # [E] live replica count per expert
    collect_stats: bool = False,
    stats_mask: jax.Array | None = None,  # [T]
    routing_fn=None,  # optional logits -> (weights, ids); default topk
):
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
    capacity factor and no token dropping.

    EPLB (reference `srt/eplb/eplb_manager.py`): when ``l2p``/``rc`` tables
    are given, the weight arrays hold PHYSICAL expert slots — a per-layer
    placement of logical experts onto ranks, possibly with redundant
    replicas of hot experts.  Routing stays logical; each assignment picks
    replica ``token_idx % rc[e]`` (spreads a hot expert's tokens across
    its copies; numerics identical since replicas share weights).  With
    ``collect_stats`` the call also returns per-LOGICAL-expert token
    counts [E] for the next rebalance."""
    E = router_w.shape[-1]
    P_slots = w_gate.shape[0]
    ep = mesh.shape[axis]
    assert P_slots % ep == 0, f"{P_slots} slots not divisible by ep={ep}"

    def local_fn(x, router_w, wg, wu, wd, l2p, rc, smask):
        T, Dm = x.shape
        E_local = wg.shape[0]
        lo = jax.lax.axis_index(axis) * E_local
        logits = jnp.einsum(
            "td,de->te", x, router_w, preferred_element_type=jnp.float32
        )
        if routing_fn is not None:
            weights, expert_ids = routing_fn(logits)
        else:
            weights, expert_ids = topk_routing(logits, top_k, norm_topk_prob)
        stats = (
            routing_counts(expert_ids, E, smask) if collect_stats else None
        )
        if l2p is not None:
            tok = jnp.arange(T, dtype=jnp.int32)[:, None]
            expert_ids = l2p[expert_ids, tok % rc[expert_ids]]
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
        out = jax.lax.psum(out.astype(x.dtype), axis)
        return (out, stats) if collect_stats else out

    wspec = P(axis, *([None] * (w_gate.ndim - 1)))
    # optional operands enter as replicated extras (routing — and hence the
    # tables and the stats mask — is identical on every device)
    have_tables = l2p is not None
    have_mask = stats_mask is not None
    args = [x, router_w, w_gate, w_up, w_down]
    in_specs = [P(), P(), wspec, wspec, wspec]
    if have_tables:
        args += [l2p, rc]
        in_specs += [P(), P()]
    if have_mask:
        args += [stats_mask]
        in_specs += [P()]

    def fn(x, r, wg, wu, wd, *rest):
        tl = tr = sm = None
        i = 0
        if have_tables:
            tl, tr = rest[0], rest[1]
            i = 2
        if have_mask:
            sm = rest[i]
        return local_fn(x, r, wg, wu, wd, tl, tr, sm)

    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()) if collect_stats else P(),
        check_vma=False,
    )(*args)


def moe_mlp_ep_a2a(
    x: jax.Array,  # [T, Dm] (replicated at the call site; sliced below)
    router_w: jax.Array,  # [Dm, E]
    w_gate: jax.Array,  # [P, Dm, F] sharded on the physical-slot dim
    w_up: jax.Array,
    w_down: jax.Array,  # [P, F, Dm]
    top_k: int,
    norm_topk_prob: bool,
    mesh,
    axis: str = "model",
    l2p: jax.Array | None = None,
    rc: jax.Array | None = None,
    collect_stats: bool = False,
    stats_mask: jax.Array | None = None,
    routing_fn=None,
):
    """Expert-parallel MoE with ALL-TO-ALL token dispatch (reference
    `layers/moe/token_dispatcher/deepep.py` normal mode): tokens shard
    over the EP axis, each rank routes only its own T/ep tokens, sends
    every (token, expert) assignment to the expert's owner over a ragged
    (capacity-padded, never-dropping) `lax.all_to_all`, computes its local
    experts' grouped GEMMs, and a2a's the results back.  Unlike
    `moe_mlp_ep` (replicated tokens — fine intra-host), activation compute
    and routing both divide by ep, which is what scales past one host.

    Capacity per (src, dst) pair = T_local*top_k (the degenerate
    all-to-one case), so no token is ever dropped; the padded buffers are
    [ep, T_local*K, Dm] — small at decode sizes, and at prefill the ICI
    a2a volume matches the assignments actually moved plus padding."""
    E = router_w.shape[-1]
    ep = mesh.shape[axis]
    T = x.shape[0]
    pad = (-T) % ep
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        if stats_mask is not None:
            stats_mask = jnp.pad(stats_mask, (0, pad))
    P_slots = w_gate.shape[0]
    assert P_slots % ep == 0

    def local_fn(x, router_w, wg, wu, wd, l2p, rc, smask):
        Tl, Dm = x.shape
        E_local = wg.shape[0]
        logits = jnp.einsum(
            "td,de->te", x, router_w, preferred_element_type=jnp.float32
        )
        if routing_fn is not None:
            weights, expert_ids = routing_fn(logits)
        else:
            weights, expert_ids = topk_routing(logits, top_k, norm_topk_prob)
        stats = (
            routing_counts(expert_ids, E, smask) if collect_stats else None
        )
        if stats is not None:
            stats = jax.lax.psum(stats, axis)
        if l2p is not None:
            tok = jnp.arange(Tl, dtype=jnp.int32)[:, None]
            expert_ids = l2p[expert_ids, tok % rc[expert_ids]]
        A = Tl * top_k
        flat_ids = expert_ids.reshape(-1).astype(jnp.int32)  # [A]
        dest = flat_ids // E_local
        rel = flat_ids % E_local
        order = jnp.argsort(dest, stable=True)
        sdest = dest[order]
        # position within each destination bucket
        first = jnp.searchsorted(sdest, sdest, side="left")
        pos = jnp.arange(A, dtype=jnp.int32) - first.astype(jnp.int32)
        rows = x[order // top_k]
        send = jnp.zeros((ep, A, Dm), x.dtype).at[sdest, pos].set(rows)
        send_rel = (
            jnp.full((ep, A), E_local, jnp.int32).at[sdest, pos]
            .set(rel[order])
        )
        send_src = (
            jnp.full((ep, A), 0, jnp.int32).at[sdest, pos].set(order)
        )

        recv = jax.lax.all_to_all(send, axis, 0, 0, tiled=True)
        recv = recv.reshape(ep, A, Dm)
        recv_rel = jax.lax.all_to_all(
            send_rel, axis, 0, 0, tiled=True
        ).reshape(ep, A)

        rflat = recv.reshape(ep * A, Dm)
        rrel = recv_rel.reshape(-1)
        order2 = jnp.argsort(rrel)  # padding (E_local) sorts last
        sx = rflat[order2]
        gs = jnp.bincount(rrel, length=E_local)
        gate = jax.lax.ragged_dot(sx, wg, gs)
        up = jax.lax.ragged_dot(sx, wu, gs)
        act = (
            jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
        ).astype(x.dtype)
        out_sorted = jax.lax.ragged_dot(act, wd, gs)
        out_r = (
            jnp.zeros((ep * A, Dm), out_sorted.dtype)
            .at[order2]
            .set(out_sorted)
        )
        back = jax.lax.all_to_all(
            out_r.reshape(ep, A, Dm), axis, 0, 0, tiled=True
        ).reshape(ep, A, Dm)
        # back[r, p] is the output for the assignment this rank staged at
        # send slot (r, p); scatter it to that assignment's flat index
        valid = send_rel < E_local  # [ep, A]
        contrib = jnp.zeros((A, Dm), out_sorted.dtype).at[
            jnp.where(valid, send_src, A)
        ].set(back.reshape(ep, A, Dm), mode="drop")
        w_eff = weights.reshape(-1).astype(contrib.dtype)
        out = (
            contrib.reshape(Tl, top_k, Dm)
            * w_eff.reshape(Tl, top_k)[..., None]
        ).sum(axis=1)
        out = out.astype(x.dtype)
        return (out, stats) if collect_stats else out

    wspec = P(axis, *([None] * (w_gate.ndim - 1)))
    have_tables = l2p is not None
    have_mask = stats_mask is not None
    args = [x, router_w, w_gate, w_up, w_down]
    in_specs = [P(axis), P(), wspec, wspec, wspec]
    if have_tables:
        args += [l2p, rc]
        in_specs += [P(), P()]
    if have_mask:
        args += [stats_mask]
        in_specs += [P(axis)]

    def fn(x, r, wg, wu, wd, *rest):
        tl = tr = sm = None
        i = 0
        if have_tables:
            tl, tr = rest[0], rest[1]
            i = 2
        if have_mask:
            sm = rest[i]
        return local_fn(x, r, wg, wu, wd, tl, tr, sm)

    out = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(axis), P()) if collect_stats else P(axis),
        check_vma=False,
    )(*args)
    if collect_stats:
        out, stats = out
        return (out[:T] if pad else out), stats
    return out[:T] if pad else out


_EP_DISPATCH = ["replicated"]  # replicated | a2a


def set_ep_dispatch(mode: str):
    """EP token-dispatch mode (reference deepep normal vs the replicated
    local-expert design; see moe_mlp_ep / moe_mlp_ep_a2a)."""
    assert mode in ("replicated", "a2a")
    _EP_DISPATCH[0] = mode


def ep_moe(*args, **kwargs):
    """Dispatch-mode front door used by the MoE model layers."""
    fn = moe_mlp_ep_a2a if _EP_DISPATCH[0] == "a2a" else moe_mlp_ep
    return fn(*args, **kwargs)


def sparsemixer_routing(logits: "jax.Array", jitter_eps: float):
    """PhiMoE inference-time sparsemixer top-2 routing (HF
    `modeling_phimoe.sparsemixer`, training branches elided): pick the
    argmax, softmax over the *threshold-masked* logits for its weight,
    mask it out and repeat for the second expert.  The mask keeps only
    experts within a relative ``2*jitter_eps`` band of the max
    (thresholds computed against the ORIGINAL logits both rounds)."""
    neg = jnp.float32(-1e30)
    s = logits.astype(jnp.float32)  # [T, E]

    def pick(cur):
        m = cur.max(axis=-1, keepdims=True)
        e = jnp.argmax(cur, axis=-1)  # [T]
        factor = jnp.maximum(jnp.abs(s), m)
        drop = ((m - s) / factor) > (2.0 * jitter_eps)
        gates = jnp.where(drop, neg, cur)
        probs = jax.nn.softmax(gates, axis=-1)
        w = jnp.take_along_axis(probs, e[:, None], axis=-1)[:, 0]
        return w, e

    w1, e1 = pick(s)
    s2 = jnp.where(
        jax.nn.one_hot(e1, s.shape[-1], dtype=bool), neg, s
    )
    w2, e2 = pick(s2)
    weights = jnp.stack([w1, w2], axis=-1)
    ids = jnp.stack([e1, e2], axis=-1).astype(jnp.int32)
    return weights, ids
