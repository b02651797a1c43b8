"""Device mesh and sharding-spec construction.

TPU-native replacement for the reference's distributed stack
(`srt/distributed/parallel_state.py` `GroupCoordinator:175`,
`initialize_model_parallel:1287`): instead of one process per accelerator
with NCCL/HCCL process groups, we build a named `jax.sharding.Mesh` with
axes ``("data", "model", "expert")`` and let XLA insert ICI collectives from
NamedSharding annotations (SPMD).  The GroupCoordinator API disappears —
mesh axis names are the group handles.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"
EXPERT_AXIS = "expert"
PIPE_AXIS = "pipe"


@dataclasses.dataclass
class ParallelConfig:
    tp_size: int = 1
    dp_size: int = 1
    ep_size: int = 1

    @property
    def world_size(self) -> int:
        return self.tp_size * self.dp_size


def build_mesh(
    tp_size: int = 1,
    dp_size: int = 1,
    pp_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh — or (pipe, data, model) when pipeline
    stages are requested.  ``expert`` reuses the model axis for now (EP
    groups derived from TP ranks, like reference `engine.py:723`)."""
    devices = list(devices if devices is not None else jax.devices())
    need = tp_size * dp_size * pp_size
    if need > len(devices):
        raise ValueError(
            f"mesh needs {need} devices (tp={tp_size} x dp={dp_size} x "
            f"pp={pp_size}), only {len(devices)} available"
        )
    if pp_size > 1:
        dev_array = np.asarray(devices[:need]).reshape(
            pp_size, dp_size, tp_size
        )
        return Mesh(dev_array, (PIPE_AXIS, DATA_AXIS, MODEL_AXIS))
    dev_array = np.asarray(devices[:need]).reshape(dp_size, tp_size)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh(device: Optional[jax.Device] = None) -> Mesh:
    device = device or jax.devices()[0]
    return Mesh(np.asarray([[device]]), (DATA_AXIS, MODEL_AXIS))


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tp_degree(mesh: Mesh) -> int:
    return mesh.shape[MODEL_AXIS]


def can_shard(dim: int, parts: int) -> bool:
    return parts > 0 and dim % parts == 0
