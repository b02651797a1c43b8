"""Sharded model-state save/load (cold-start without HF parsing).

Counterpart of the reference's `ShardedStateLoader`
(`model_loader/loader.py:589`) and remote model save
(`model_runner.py:1760` save_remote_model): dump the FULLY PREPARED param
pytree — post weight-load, post quantization, post projection fusion —
as per-host shard files, so a restart (or a fleet of identical hosts)
skips safetensors parsing, weight-map assembly and re-quantization
entirely and streams ready shards straight to devices.

Format (`<dir>/`):
  * `meta.pkl` — pickled {treedef, specs, shapes, dtypes, nprocs}; the
    treedef covers the registered quant dataclasses (QuantizedWeight*).
  * `shard_host{P}.npz` — every leaf's addressable device shards from
    process P, keyed `l{leaf}_d{device_id}`.

Constraints (same class as the reference's sharded loader): the loading
run must use the same mesh topology / device ids and the same model +
quantization flags as the saving run.
"""

from __future__ import annotations

import logging
import os
import pickle

import jax
import numpy as np

logger = logging.getLogger(__name__)

META = "meta.pkl"


def save_sharded_state(params, path: str) -> int:
    """Write this process's shards of every leaf; process 0 writes meta.
    Returns the number of leaves saved."""
    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    pid = jax.process_index()
    if pid == 0:
        meta = {
            "treedef": treedef,
            "specs": [
                tuple(getattr(l.sharding, "spec", ()) or ()) for l in leaves
            ],
            "shapes": [tuple(l.shape) for l in leaves],
            "dtypes": [str(l.dtype) for l in leaves],
            "nprocs": jax.process_count(),
        }
        with open(os.path.join(path, META), "wb") as f:
            pickle.dump(meta, f)
    arrays = {}
    for i, leaf in enumerate(leaves):
        for shard in leaf.addressable_shards:
            arrays[f"l{i}_d{shard.device.id}"] = np.asarray(shard.data)
    np.savez(os.path.join(path, f"shard_host{pid}.npz"), **arrays)
    logger.info(
        "sharded state saved: %d leaves, %d local shards -> %s",
        len(leaves), len(arrays), path,
    )
    return len(leaves)


def has_sharded_state(path: str) -> bool:
    return os.path.exists(os.path.join(path, META))


def load_sharded_state(path: str, mesh):
    """Rebuild the param pytree from shard files; every process reads its
    own `shard_host{P}.npz` and places shards on its local devices."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    with open(os.path.join(path, META), "rb") as f:
        meta = pickle.load(f)
    if meta["nprocs"] != jax.process_count():
        raise ValueError(
            f"sharded state was saved from {meta['nprocs']} processes, "
            f"this run has {jax.process_count()}"
        )
    pid = jax.process_index()
    z = np.load(os.path.join(path, f"shard_host{pid}.npz"))
    local_devices = {d.id: d for d in jax.local_devices()}
    leaves = []
    for i, (spec, shape, dt) in enumerate(
        zip(meta["specs"], meta["shapes"], meta["dtypes"])
    ):
        sharding = NamedSharding(mesh, P(*spec))
        per_dev = []
        for did, dev in local_devices.items():
            key = f"l{i}_d{did}"
            if key in z:
                per_dev.append(jax.device_put(z[key], dev))
        arr = jax.make_array_from_single_device_arrays(
            tuple(shape), sharding, per_dev
        )
        leaves.append(arr)
    logger.info("sharded state loaded: %d leaves from %s", len(leaves), path)
    return jax.tree_util.tree_unflatten(meta["treedef"], leaves)
