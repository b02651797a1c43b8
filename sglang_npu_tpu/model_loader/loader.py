"""Weight loading: HF safetensors -> sharded stacked-layer pytrees.

Counterpart of the reference's `srt/model_loader/loader.py`
(`DefaultModelLoader:202`, `DummyModelLoader:531`): instead of per-module
`weight_loader` callbacks, each model class publishes a declarative
`hf_weight_map()` (HF tensor name -> stacked pytree path + transform), and
the loader assembles host numpy stacks then `jax.device_put`s them with the
model's NamedShardings — one transfer per parameter, laid out for TP from
the start.
"""

from __future__ import annotations

import glob
import json
import logging
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def _np_dtype(jdt) -> np.dtype:
    if jdt == jnp.bfloat16:
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(jdt)


def _set_path(tree: Dict[str, Any], path: str, value):
    keys = path.split(".")
    for k in keys[:-1]:
        tree = tree.setdefault(k, {})
    tree[keys[-1]] = value


def _get_path(tree: Dict[str, Any], path: str):
    for k in path.split("."):
        tree = tree[k]
    return tree


def allocate_host_params(model) -> Dict[str, Any]:
    """Allocate zeroed host numpy arrays matching model.param_shapes()."""

    def alloc(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = alloc(v)
            else:
                shape, dtype = v
                out[k] = np.zeros(shape, dtype=_np_dtype(dtype))
        return out

    return alloc(model.param_shapes())


def load_safetensors_weights(model, model_path: str) -> Dict[str, Any]:
    """Read all *.safetensors under model_path into stacked host arrays."""
    from safetensors import safe_open

    host = allocate_host_params(model)
    top_map, per_layer_map = model.hf_weight_map()
    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {model_path}")

    loaded = set()
    for fpath in files:
        with safe_open(fpath, framework="np") as f:
            for name in f.keys():
                dest = None
                layer_idx = None
                if name in top_map:
                    dest, transform = top_map[name]
                elif name.startswith("model.layers."):
                    parts = name.split(".")
                    layer_idx = int(parts[2])
                    suffix = ".".join(parts[3:])
                    if suffix in per_layer_map:
                        dest, transform = per_layer_map[suffix]
                if dest is None:
                    logger.debug("skipping unmapped weight %s", name)
                    continue
                expert_idx = None
                if ".__expert__" in dest:
                    dest, e = dest.split(".__expert__")
                    expert_idx = int(e)
                tensor = f.get_tensor(name)
                if transform == "transpose":
                    tensor = tensor.T
                elif transform == "squeeze":
                    tensor = tensor.reshape(-1)
                target = _get_path(host, dest)
                if layer_idx is not None:
                    target = target[layer_idx]
                if expert_idx is not None:
                    target = target[expert_idx]
                np.copyto(target, tensor.astype(target.dtype))
                loaded.add(name)
    logger.info("loaded %d tensors from %d files", len(loaded), len(files))
    return host


def init_dummy_weights(model, seed: int = 0) -> Dict[str, Any]:
    """Random-weight init for perf tests (reference `DummyModelLoader:531`,
    `--load-format dummy`)."""
    rng = np.random.default_rng(seed)

    def init(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = init(v)
            else:
                shape, dtype = v
                if "norm" in k:
                    out[k] = np.ones(shape, dtype=_np_dtype(dtype))
                else:
                    arr = rng.standard_normal(size=shape, dtype=np.float32) * 0.02
                    out[k] = arr.astype(_np_dtype(dtype))
        return out

    return init(model.param_shapes())


def device_put_params(host_params, model, mesh) -> Dict[str, Any]:
    """Transfer host params to devices with the model's TP shardings."""
    specs = model.param_shardings()

    def put(node, spec_node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = put(v, spec_node[k])
            else:
                spec = spec_node.get(k, P()) if isinstance(spec_node, dict) else P()
                # Drop the sharded axis if it does not divide evenly.
                spec = _validate_spec(v.shape, spec, mesh)
                out[k] = jax.device_put(v, NamedSharding(mesh, spec))
        return out

    return put(host_params, specs)


def _validate_spec(shape, spec: P, mesh) -> P:
    fixed = []
    for dim, axis in enumerate(spec):
        if axis is None:
            fixed.append(None)
            continue
        parts = mesh.shape[axis] if axis in mesh.shape else 1
        fixed.append(axis if shape[dim] % parts == 0 else None)
    return P(*fixed)


def init_dummy_weights_device(model, mesh, seed: int = 0) -> Dict[str, Any]:
    """Generate dummy weights directly on the devices (jit with
    out_shardings) — avoids host->device transfer entirely, which matters
    on low-bandwidth links and multi-GB models."""
    import functools

    key = jax.random.key(seed)
    specs = model.param_shardings()
    counter = [0]

    def init(node, spec_node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = init(v, spec_node[k])
                continue
            shape, dtype = v
            spec = spec_node.get(k, P()) if isinstance(spec_node, dict) else P()
            spec = _validate_spec(shape, spec, mesh)
            sharding = NamedSharding(mesh, spec)
            counter[0] += 1
            leaf_key = jax.random.fold_in(key, counter[0])
            if "norm" in k:
                fn = jax.jit(
                    lambda _k, s=shape, d=dtype: jnp.ones(s, d),
                    out_shardings=sharding,
                )
            else:
                fn = jax.jit(
                    lambda _k, s=shape, d=dtype: (
                        jax.random.normal(_k, s, jnp.float32) * 0.02
                    ).astype(d),
                    out_shardings=sharding,
                )
            out[k] = fn(leaf_key)
        return out

    return init(model.param_shapes(), specs)


def load_model_weights(model, model_path: str, load_format: str, mesh, seed: int = 0):
    if load_format == "dummy":
        return init_dummy_weights_device(model, mesh, seed)
    host = load_safetensors_weights(model, model_path)
    return device_put_params(host, model, mesh)
