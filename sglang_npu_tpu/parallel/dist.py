"""Cross-host SPMD runtime.

TPU-native replacement for the reference's multi-node distributed stack
(`srt/distributed/parallel_state.py` `init_distributed_environment:1232`,
`initialize_model_parallel:1287`): instead of one torch process group per
accelerator with NCCL/HCCL, every host runs ONE process; processes join a
JAX distributed runtime (`jax.distributed.initialize`) and build one global
device mesh, so a jitted step is a single SPMD program whose collectives
ride ICI within a host and DCN across hosts.  The GroupCoordinator API
disappears — what survives of it is the CPU-side object broadcast, which
becomes the scheduler lockstep channel
(`managers/zmq_transport.SpmdStepChannel`).

Process model (reference `engine.py:715-741` spawns one scheduler process
per tp rank; here one per HOST):

    node 0:  Engine (tokenizer/detok/HTTP) + Scheduler + ModelRunner
    node k:  launch_worker --multihost-spmd  -> Scheduler + ModelRunner

Every Scheduler replica consumes the identical per-iteration input list
(broadcast by node 0) and makes identical, deterministic decisions, so all
processes call the same jitted functions in the same order with the same
metadata — the requirement for multi-process JAX.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_INITIALIZED = False


def spmd_coordinator_address(dist_init_addr: str) -> str:
    """The JAX coordinator binds the base --dist-init-addr port (the ZMQ
    control plane uses PORT+1/+5/+6/+10+k, see zmq_transport.py)."""
    host, port = dist_init_addr.rsplit(":", 1)
    if host in ("", "*", "0.0.0.0"):
        host = "127.0.0.1"
    return f"{host}:{int(port)}"


def init_multihost_spmd(server_args) -> bool:
    """`jax.distributed.initialize` for cross-host SPMD.  Must run before
    any JAX backend/device use in the process.  Returns True when the
    process joined a multi-process runtime."""
    global _INITIALIZED
    if not getattr(server_args, "multihost_spmd", False) or server_args.nnodes <= 1:
        return False
    if _INITIALIZED:
        return True
    assert server_args.dist_init_addr, "--dist-init-addr required for SPMD"
    import jax

    kwargs = {}
    n_local = getattr(server_args, "spmd_local_devices", None)
    if n_local:
        # CPU-mesh testing: both processes expose virtual devices 0..n-1
        kwargs["local_device_ids"] = list(range(int(n_local)))
    jax.distributed.initialize(
        coordinator_address=spmd_coordinator_address(server_args.dist_init_addr),
        num_processes=server_args.nnodes,
        process_id=server_args.node_rank,
        **kwargs,
    )
    _INITIALIZED = True
    logger.info(
        "joined SPMD runtime: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        len(jax.local_devices()),
        len(jax.devices()),
    )
    return True


def is_multiprocess() -> bool:
    if not _INITIALIZED:
        return False
    import jax

    return jax.process_count() > 1


def fetch_np(arr) -> np.ndarray:
    """Device→host fetch that also works for multi-process global arrays.

    Replicated outputs (tokens, logprobs) read from local shards; a
    sharded output falls back to a process_allgather — a collective, so
    in SPMD mode every process must reach this call in lockstep (the
    deterministic scheduler guarantees it)."""
    import jax

    if arr is None:
        return None
    if not isinstance(arr, jax.Array):
        return np.asarray(arr)
    if arr.is_fully_addressable or arr.is_fully_replicated:
        return np.asarray(jax.device_get(arr))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def zeros_global(shape, dtype, sharding):
    """Allocate a (possibly multi-host) sharded zeros buffer on device —
    each process materializes only its local shards (no host transfer,
    critical for multi-GB KV pools behind a ~5 MB/s tunnel)."""
    import functools

    import jax
    import jax.numpy as jnp

    return jax.jit(
        functools.partial(jnp.zeros, shape, dtype), out_shardings=sharding
    )()
