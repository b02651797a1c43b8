"""Expert-parallel load balancing (EPLB).

TPU-native counterpart of the reference's `srt/eplb/` stack
(`eplb_manager.py:20`, `eplb_algorithms/deepseek.py`,
`expert_location.py`): periodically recompute a per-layer placement of
LOGICAL experts onto PHYSICAL weight slots (ep ranks × slots-per-rank,
optionally with redundant replicas of hot experts), then apply it by
permuting the stacked expert weight arrays on device — a single gather
along the expert dim per weight — and swapping the small routing tables
(`l2p`, `rc`) that `layers/moe.moe_mlp_ep` reads.

Because replicas share weights, a rebalance is numerics-invariant: greedy
outputs are bit-identical before and after (tested in
`tests/test_eplb.py`).  Load statistics come from the logical-expert
token counts the MoE layer emits when stats collection is enabled
(reference `expert_distribution.py` recorder).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


def allocate_replicas(load: np.ndarray, n_slots: int) -> np.ndarray:
    """Distribute ``n_slots`` physical slots over E logical experts:
    every expert gets one, redundant slots go greedily to the expert with
    the highest per-replica load (reference eplb_algorithms: replica
    count ∝ load)."""
    E = load.shape[0]
    assert n_slots >= E, f"need at least {E} slots, have {n_slots}"
    load = load.astype(np.float64) + 1e-9  # break ties deterministically
    rc = np.ones(E, dtype=np.int64)
    for _ in range(n_slots - E):
        rc[np.argmax(load / rc)] += 1
    return rc


def pack_slots(
    load: np.ndarray, rc: np.ndarray, ep: int, slots_per_rank: int
) -> np.ndarray:
    """Assign each replica to a rank (longest-processing-time greedy:
    heaviest replica first onto the least-loaded rank with a free slot).
    Returns phys2log [ep * slots_per_rank]."""
    E = load.shape[0]
    per_replica = load.astype(np.float64) / np.maximum(rc, 1)
    replicas: List[Tuple[float, int]] = []
    for e in range(E):
        replicas.extend([(per_replica[e], e)] * int(rc[e]))
    replicas.sort(key=lambda t: (-t[0], t[1]))

    rank_load = np.zeros(ep, dtype=np.float64)
    rank_free = np.full(ep, slots_per_rank, dtype=np.int64)
    rank_slots: List[List[int]] = [[] for _ in range(ep)]
    for w, e in replicas:
        order = np.argsort(rank_load, kind="stable")
        for r in order:
            if rank_free[r] > 0:
                rank_slots[r].append(e)
                rank_load[r] += w
                rank_free[r] -= 1
                break
    phys2log = np.concatenate(
        [
            np.array(s + [0] * int(rank_free[r]), dtype=np.int64)
            for r, s in enumerate(rank_slots)
        ]
    )
    return phys2log


def compute_placement(
    load: np.ndarray, ep: int, n_redundant: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(phys2log [P], l2p [E, 1+n_redundant], rc [E]) for one layer."""
    E = load.shape[0]
    P = E + n_redundant
    assert P % ep == 0, f"{P} physical slots not divisible by ep={ep}"
    repl = allocate_replicas(load, P)
    phys2log = pack_slots(load, repl, ep, P // ep)
    R = 1 + n_redundant
    l2p = np.zeros((E, R), dtype=np.int32)
    rc = np.zeros(E, dtype=np.int32)
    for p, e in enumerate(phys2log):
        if rc[e] < R:
            l2p[e, rc[e]] = p
            rc[e] += 1
    # pad unused replica columns with the primary so any out-of-range
    # lookup stays valid
    for e in range(E):
        l2p[e, rc[e] :] = l2p[e, 0]
    assert (rc >= 1).all()
    return phys2log, l2p, rc


@dataclasses.dataclass
class EplbState:
    """Per-layer placement bookkeeping held by the ModelRunner."""

    num_experts: int  # E (logical)
    n_redundant: int  # physical slots = E + n_redundant
    ep: int
    # [n_moe_layers, P]: logical expert stored in each physical slot
    phys2log: np.ndarray

    @classmethod
    def initial(cls, n_layers: int, num_experts: int, n_redundant: int, ep: int):
        """Identity placement; redundant slots unused (rc=1) until the
        first rebalance populates them."""
        P = num_experts + n_redundant
        p2l = np.tile(np.arange(P, dtype=np.int64) % num_experts, (n_layers, 1))
        return cls(num_experts, n_redundant, ep, p2l)

    def initial_tables(self) -> Tuple[np.ndarray, np.ndarray]:
        """(l2p [L, E, R], rc [L, E]) matching `initial` — only the first
        E identity slots are live."""
        L = self.phys2log.shape[0]
        E, R = self.num_experts, 1 + self.n_redundant
        l2p = np.tile(
            np.arange(E, dtype=np.int32)[None, :, None], (L, 1, R)
        )
        rc = np.ones((L, E), dtype=np.int32)
        return l2p, rc

    def rebalance(
        self, counts: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Compute new placements from per-layer logical load counts
        [L, E].  Returns (gather_idx [L, P], l2p [L, E, R], rc [L, E])
        where ``gather_idx[l, p]`` is the CURRENT physical slot to copy
        into new slot p (so weights update with one jnp.take per leaf).
        Updates self.phys2log."""
        L, E = counts.shape
        assert E == self.num_experts and L == self.phys2log.shape[0]
        P = E + self.n_redundant
        gather = np.zeros((L, P), dtype=np.int32)
        l2p_all = np.zeros((L, E, 1 + self.n_redundant), dtype=np.int32)
        rc_all = np.zeros((L, E), dtype=np.int32)
        for l in range(L):
            p2l, l2p, rc = compute_placement(counts[l], self.ep, self.n_redundant)
            # current primary slot of each logical expert (first occurrence)
            cur_primary = np.zeros(E, dtype=np.int32)
            seen = np.zeros(E, dtype=bool)
            for p, e in enumerate(self.phys2log[l]):
                if not seen[e]:
                    cur_primary[e] = p
                    seen[e] = True
            gather[l] = cur_primary[p2l]
            l2p_all[l], rc_all[l] = l2p, rc
            self.phys2log[l] = p2l
        return gather, l2p_all, rc_all
