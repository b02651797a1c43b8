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
from typing import Any, Dict, Optional

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


_QUANT_SUFFIXES = ("qweight", "qzeros", "scales", "g_idx")

# compressed-tensors sidecar suffixes (llm-compressor serialization)
_CT_SUFFIXES = (
    "weight_scale", "weight_zero_point", "weight_packed", "weight_shape",
    "weight_g_idx", "input_scale", "input_zero_point",
)


def load_safetensors_weights(model, model_path: str) -> Dict[str, Any]:
    """Read all *.safetensors under model_path into stacked host arrays.

    AWQ/GPTQ checkpoints (detected via quantization_config) route each
    linear's qweight/qzeros/scales[/g_idx] set through
    `quant_ingest.convert_quant_tensors` and store a stacked
    `QuantizedWeightW4` in place of the dense weight."""
    from safetensors import safe_open

    from sglang_npu_tpu.model_loader.quant_ingest import (
        convert_quant_tensors,
        detect_quant_config,
        pack_w4_np,
    )

    from sglang_npu_tpu.model_loader.bnb_loader import (
        dequantize_bnb_tensor,
        is_bnb_quant_config,
        split_bnb_key,
    )

    qcfg = detect_quant_config(model_path)
    bnb = is_bnb_quant_config(qcfg)
    if bnb:
        qcfg = None  # the AWQ/GPTQ suffix path below does not apply
    # native blockwise-FP8 checkpoints (DeepSeek-V3/R1): fp8 `.weight`
    # tensors paired with `.weight_scale_inv` per-128x128-block scales
    fp8_block = None
    if qcfg is not None and qcfg["method"] == "fp8":
        fp8_block = qcfg.get("weight_block_size") or [128, 128]
        qcfg = None
    # llm-compressor "compressed-tensors" checkpoints (reference
    # `layers/quantization/compressed_tensors/`): int8/fp8 `weight` +
    # `weight_scale` per linear (8-bit), or `weight_packed` int32 nibble
    # tensors (pack-quantized 4-bit).
    ct = None
    if qcfg is not None and qcfg["method"] == "compressed-tensors":
        ct = qcfg
        qcfg = None
        if ct["bits"] == 4 and (
            ct["checkpoint_format"] != "pack-quantized" or not ct["sym"]
        ):
            logger.warning(
                "compressed-tensors 4-bit format=%s sym=%s not ingestible; "
                "expect missing weights",
                ct["checkpoint_format"], ct["sym"],
            )
    if qcfg is not None and qcfg["bits"] != 4:
        logger.warning(
            "quantized checkpoint with bits=%d; only 4-bit ingestion is "
            "implemented, loading dense tensors only", qcfg["bits"],
        )
        qcfg = None

    host = allocate_host_params(model)
    top_map, per_layer_map = model.hf_weight_map()
    # Extra stacked-block families beyond "model.layers." (e.g. a vision
    # tower's "visual.blocks.{i}." — see models/qwen2_5_vl.hf_block_maps)
    block_maps = getattr(model, "hf_block_maps", lambda: {})()
    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {model_path}")

    loaded = set()
    qcollect: Dict[tuple, Dict[str, np.ndarray]] = {}
    bnb_collect: Dict[str, Dict] = {}
    fp8_collect: Dict[tuple, Dict[str, np.ndarray]] = {}
    ct_collect: Dict[tuple, Dict[str, np.ndarray]] = {}

    def _get_tensor_any(fpath, np_file, name):
        """np-framework read with a torch fallback for dtypes numpy's
        safetensors bridge rejects (float8)."""
        try:
            return np_file.get_tensor(name)
        except Exception:
            import ml_dtypes
            import torch
            from safetensors import safe_open as _so

            with _so(fpath, framework="pt") as pf:
                t = pf.get_tensor(name)
            if t.dtype == torch.float8_e4m3fn:
                return t.view(torch.uint8).numpy().view(ml_dtypes.float8_e4m3fn)
            if t.dtype == torch.bfloat16:
                return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
            return t.numpy()

    def _store(dest, layer_idx, expert_idx, transform, tensor):
        if isinstance(dest, (list, tuple)):
            # fused checkpoint tensor feeding several stacked destinations
            # (baichuan W_pack, qwen-v1 c_attn, internlm2 wqkv, chatglm
            # query_key_value): each entry is (sub_dest, slicer) where the
            # slicer is a callable mapping the full tensor to that
            # destination's share
            for d, tf in dest:
                _store(d, layer_idx, expert_idx, tf, tensor)
            return
        if callable(transform):
            tensor = transform(tensor)
        elif transform == "transpose":
            tensor = tensor.T
        elif transform == "squeeze":
            tensor = tensor.reshape(-1)
        elif transform == "flatten_oc_transpose":
            # ConvNd kernel [out_c, ...] -> [prod(...), out_c]
            tensor = tensor.reshape(tensor.shape[0], -1).T
        elif transform == "transpose_last2":
            # stacked per-expert [E, out, in] -> [E, in, out]
            tensor = tensor.swapaxes(-1, -2)
        elif transform in ("unstack_experts", "unstack_experts_t"):
            # DBRX flat expert blobs [E*F, D]: reshape to the
            # target's expert count; "_t" also swaps to [E, D, F]
            tgt = _get_path(host, dest)
            if layer_idx is not None:
                tgt = tgt[layer_idx]
            tensor = tensor.reshape(tgt.shape[0], -1, tensor.shape[-1])
            if transform == "unstack_experts_t":
                tensor = tensor.swapaxes(-1, -2)
        target = _get_path(host, dest)
        if layer_idx is not None:
            target = target[layer_idx]
        if expert_idx is not None:
            target = target[expert_idx]
        if transform == "reshape":
            # drop leading broadcast dims (e.g. [1, T, H] pos tables)
            tensor = tensor.reshape(target.shape)
        np.copyto(target, tensor.astype(target.dtype))

    for fpath in files:
        with safe_open(fpath, framework="np") as f:
            for name in f.keys():
                if bnb:
                    side = split_bnb_key(name)
                    if side is not None:
                        base, suf = side
                        bnb_collect.setdefault(base, {})[suf] = f.get_tensor(
                            name
                        )
                        loaded.add(name)
                        continue
                qsuffix = None
                lookup = name
                if lookup.startswith("model.language_model."):
                    # VLM checkpoints nest the text trunk (qwen2.5-vl)
                    lookup = "model." + lookup[len("model.language_model."):]
                elif lookup.startswith("language_model.model."):
                    # older llava-style nesting
                    lookup = "model." + lookup[len("language_model.model."):]
                elif lookup.startswith("language_model.lm_head."):
                    lookup = lookup[len("language_model."):]
                if qcfg is not None:
                    tail = name.rsplit(".", 1)[-1]
                    if tail in _QUANT_SUFFIXES:
                        qsuffix = tail
                        lookup = name[: -(len(tail) + 1)] + ".weight"
                ct_suffix = None
                if ct is not None:
                    tail = lookup.rsplit(".", 1)[-1]
                    if tail in _CT_SUFFIXES:
                        ct_suffix = tail
                        lookup = (
                            lookup[: -(len(tail) + 1)] + ".weight"
                        )
                fscale = False
                if fp8_block is not None and lookup.endswith(
                    ".weight_scale_inv"
                ):
                    fscale = True
                    lookup = lookup[: -len(".weight_scale_inv")] + ".weight"
                dest = None
                layer_idx = None
                if lookup in top_map:
                    dest, transform = top_map[lookup]
                elif lookup.startswith("model.layers."):
                    parts = lookup.split(".")
                    layer_idx = int(parts[2])
                    suffix = ".".join(parts[3:])
                    if suffix in per_layer_map:
                        dest, transform = per_layer_map[suffix]
                elif lookup.startswith("layers."):
                    # EAGLE draft heads name layers without the "model."
                    # prefix (yuhuili/EAGLE-* checkpoints)
                    parts = lookup.split(".")
                    layer_idx = int(parts[1])
                    suffix = ".".join(parts[2:])
                    if suffix in per_layer_map:
                        dest, transform = per_layer_map[suffix]
                if dest is None and block_maps:
                    stripped = (
                        lookup[6:] if lookup.startswith("model.") else lookup
                    )
                    for pref, bm in block_maps.items():
                        if stripped.startswith(pref):
                            parts = stripped[len(pref):].split(".")
                            suffix = ".".join(parts[1:])
                            if suffix in bm:
                                layer_idx = int(parts[0])
                                dest, transform = bm[suffix]
                            break
                if dest is None:
                    logger.debug("skipping unmapped weight %s", name)
                    continue
                expert_idx = None
                if isinstance(dest, str) and ".__expert__" in dest:
                    dest, e = dest.split(".__expert__")
                    expert_idx = int(e)
                tensor = _get_tensor_any(fpath, f, name)
                if fp8_block is not None and (
                    fscale or str(tensor.dtype) == "float8_e4m3fn"
                ):
                    entry = fp8_collect.setdefault(
                        (dest, layer_idx, expert_idx), {}
                    )
                    entry["scale" if fscale else "weight"] = tensor
                    entry["_t"] = transform
                    loaded.add(name)
                    continue
                if qsuffix is not None:
                    qcollect.setdefault((dest, layer_idx, expert_idx), {})[
                        qsuffix
                    ] = tensor
                    loaded.add(name)
                    continue
                if ct is not None and (
                    ct_suffix is not None
                    or str(tensor.dtype) in ("int8", "float8_e4m3fn")
                ):
                    loaded.add(name)
                    if ct_suffix in ("weight_shape", "weight_g_idx"):
                        continue  # redundant with the mapped dense shape
                    if ct_suffix in ("input_scale", "input_zero_point"):
                        # static activation scales: this engine quantizes
                        # activations dynamically per token (same numerics
                        # class, no calibration dependence)
                        continue
                    key = ct_suffix or "weight"
                    entry = ct_collect.setdefault(
                        (dest, layer_idx, expert_idx), {}
                    )
                    if ct["bits"] == 4 and key == "weight_scale":
                        # W4 assembly expects scales in [K/g, N]
                        tensor = tensor.astype(np.float32).T
                        key = "scales"
                    entry[key] = tensor
                    entry["_t"] = transform
                    continue
                if bnb and tensor.dtype == np.uint8 and name.endswith(".weight"):
                    # bnb-packed linear: dequantize once sidecars arrive
                    entry = bnb_collect.setdefault(name, {})
                    entry["weight"] = tensor
                    entry["_dest"] = (dest, layer_idx, expert_idx, transform)
                    loaded.add(name)
                    continue
                _store(dest, layer_idx, expert_idx, transform, tensor)
                loaded.add(name)

    for base, entry in bnb_collect.items():
        if "_dest" not in entry:
            logger.debug("skipping unmapped bnb weight %s", base)
            continue
        dest, layer_idx, expert_idx, transform = entry["_dest"]
        dense = dequantize_bnb_tensor(entry)
        _store(dest, layer_idx, expert_idx, transform, dense)

    if qcollect:
        _assemble_w4_stacks(host, model, qcollect, qcfg, pack_w4_np,
                            convert_quant_tensors)
    if fp8_collect:
        _assemble_fp8_stacks(host, model, fp8_collect, fp8_block)
    if ct_collect:
        if ct["bits"] == 4:
            _assemble_w4_stacks(host, model, ct_collect, ct, pack_w4_np,
                                convert_quant_tensors)
        else:
            _assemble_ct_w8_stacks(host, model, ct_collect, ct)
    logger.info("loaded %d tensors from %d files", len(loaded), len(files))
    return host


def _assemble_fp8_stacks(host, model, collect, block_size):
    """Replace dense host stacks with blockwise-FP8 stacks (native
    DeepSeek-V3/R1 format: fp8 `.weight` + f32 `.weight_scale_inv` per
    [block_n, block_k] block; reference `layers/quantization/fp8.py`)."""
    import ml_dtypes

    shapes = model.param_shapes()
    by_dest: Dict[str, Dict] = {}
    for (dest, layer_idx, expert_idx), entry in collect.items():
        by_dest.setdefault(dest, {})[(layer_idx, expert_idx)] = entry
    bn_out, bk_in = int(block_size[0]), int(block_size[1])
    for dest, entries in by_dest.items():
        (L_shape, _dt) = _get_path(shapes, dest)
        K, N = L_shape[-2], L_shape[-1]
        Kb, Nb = -(-K // bk_in), -(-N // bn_out)
        q_stack = np.zeros(
            L_shape[:-2] + (K, N), dtype=ml_dtypes.float8_e4m3fn
        )
        s_stack = np.ones(L_shape[:-2] + (Kb, Nb), dtype=np.float32)
        for (layer_idx, expert_idx), entry in entries.items():
            w = entry.get("weight")
            s = entry.get("scale")
            if w is None:
                logger.warning("fp8 scale without weight for %s", dest)
                continue
            t = entry.get("_t")
            if t == "transpose" or (t is None and w.shape == (N, K)):
                w = w.T
                s = s.T if s is not None else None
            assert w.shape == (K, N), (dest, w.shape, (K, N))
            idx = ()
            if layer_idx is not None:
                idx = idx + (layer_idx,)
            if expert_idx is not None:
                idx = idx + (expert_idx,)
            q_stack[idx] = w
            if s is not None:
                s_stack[idx] = s.astype(np.float32)
        _set_path(
            host, dest, {"__fp8b__": True, "q": q_stack, "s": s_stack}
        )
        logger.info(
            "ingested blockwise-FP8 stack for %s: K=%d N=%d blocks=(%d,%d)",
            dest, K, N, bk_in, bn_out,
        )


def _assemble_ct_w8_stacks(host, model, collect, ct):
    """Replace dense host stacks with 8-bit compressed-tensors stacks
    (int-quantized / float-quantized: `weight` int8|f8 [N, K] +
    `weight_scale` per-channel [N, 1] or per-tensor scalar).  Emits
    `{"__w8__": ..., "q": [..., K, N], "s": [..., 1, N]}` consumed by
    device_put_params as QuantizedWeight / QuantizedWeightFP8 — the same
    classes `--quantization int8|fp8` produce, so the serving path
    (Pallas W8 kernel / int8-MXU a8 dot) is shared.  Unsupported schemes
    (zero points, group-strategy int8) dequantize to dense on host."""
    shapes = model.param_shapes()
    by_dest: Dict[str, Dict] = {}
    for (dest, layer_idx, expert_idx), entry in collect.items():
        by_dest.setdefault(dest, {})[(layer_idx, expert_idx)] = entry
    is_float = ct["ct_type"] == "float"
    for dest, entries in by_dest.items():
        (L_shape, _dt) = _get_path(shapes, dest)
        K, N = L_shape[-2], L_shape[-1]
        sample = next(iter(entries.values()))
        dense_fallback = "weight_zero_point" in sample or (
            not is_float and ct["ct_strategy"] == "group"
        )
        if is_float:
            import ml_dtypes

            qdt = ml_dtypes.float8_e4m3fn
        else:
            qdt = np.int8
        q_stack = np.zeros(L_shape[:-2] + (K, N), dtype=qdt)
        s_stack = np.ones(L_shape[:-2] + (1, N), dtype=np.float32)
        for (layer_idx, expert_idx), entry in entries.items():
            w = entry.get("weight")
            s = entry.get("weight_scale")
            if w is None or s is None:
                logger.warning("incomplete compressed-tensors set for %s",
                               dest)
                continue
            t = entry.get("_t")
            if t == "transpose" or (t is None and w.shape == (N, K)):
                w = w.T
            assert w.shape == (K, N), (dest, w.shape, (K, N))
            idx = ()
            if layer_idx is not None:
                idx = idx + (layer_idx,)
            if expert_idx is not None:
                idx = idx + (expert_idx,)
            s32 = np.asarray(s, dtype=np.float32)
            if dense_fallback:
                z = entry.get("weight_zero_point")
                wd = w.astype(np.float32)
                if not is_float and ct["ct_strategy"] == "group":
                    g = K // s32.T.shape[0] if s32.ndim == 2 else K
                    sb = np.repeat(s32.T, g, axis=0)[:K]
                    wd = wd * sb
                else:
                    sv = s32.reshape(-1)
                    sb = (
                        np.full((N,), sv[0], np.float32)
                        if sv.size == 1 else sv
                    )
                    if z is not None:
                        wd = wd - np.asarray(z, np.float32).reshape(-1)[None, :]
                    wd = wd * sb[None, :]
                tgt = _get_path(host, dest)
                if isinstance(tgt, dict):
                    raise RuntimeError(
                        f"mixed quantized/dense entries for {dest}"
                    )
                for i in idx:
                    tgt = tgt[i]
                np.copyto(tgt, wd.astype(tgt.dtype))
                continue
            sv = s32.reshape(-1)
            if sv.size == 1:
                sv = np.full((N,), sv[0], np.float32)
            q_stack[idx] = w
            s_stack[idx] = sv.reshape(1, N)
        if dense_fallback:
            logger.info(
                "compressed-tensors %s: dequantized to dense (zero-point "
                "or group-int8 scheme)", dest,
            )
            continue
        _set_path(
            host, dest,
            {"__w8__": "fp8" if is_float else "int8",
             "q": q_stack, "s": s_stack},
        )
        logger.info(
            "ingested compressed-tensors W8(%s) stack for %s: K=%d N=%d",
            "fp8" if is_float else "int8", dest, K, N,
        )


def _assemble_w4_stacks(host, model, qcollect, qcfg, pack_w4_np, convert):
    """Replace dense host stacks with packed W4 stacks for every linear
    that arrived quantized."""
    shapes = model.param_shapes()
    by_dest: Dict[str, Dict] = {}
    for (dest, layer_idx, expert_idx), tensors in qcollect.items():
        by_dest.setdefault(dest, {})[(layer_idx, expert_idx)] = tensors
    method = qcfg["method"]
    v2 = qcfg.get("checkpoint_format") == "gptq_v2"
    for dest, entries in by_dest.items():
        (L_shape, _dt) = _get_path(shapes, dest)
        # dense logical shape [..., K, N] (possibly [L, K, N] or [L, E, K, N])
        K, N = L_shape[-2], L_shape[-1]
        sample = next(iter(entries.values()))
        s_sample = sample["scales"]
        G = s_sample.shape[0]
        g = K // G
        q_stack = np.zeros(L_shape[:-2] + (K // 2, N), dtype=np.uint8)
        s_stack = np.zeros(L_shape[:-2] + (G, N), dtype=np.float32)
        b_stack = np.zeros(L_shape[:-2] + (G, N), dtype=np.float32)
        perm_stack = None
        for (layer_idx, expert_idx), tensors in entries.items():
            q4, s, b, perm = convert(method, tensors, v2=v2)
            assert q4.shape == (K, N), (dest, q4.shape, (K, N))
            packed = pack_w4_np(q4, g)
            idx = ()
            if layer_idx is not None:
                idx = idx + (layer_idx,)
            if expert_idx is not None:
                idx = idx + (expert_idx,)
            q_stack[idx] = packed
            s_stack[idx] = s
            b_stack[idx] = b
            if perm is not None:
                if perm_stack is None:
                    perm_stack = np.tile(
                        np.arange(K, dtype=np.int32), L_shape[:-2] + (1,)
                    )
                perm_stack[idx] = perm
        _set_path(
            host,
            dest,
            {
                "__w4__": True,
                "q": q_stack,
                "s": s_stack,
                "b": b_stack,
                **({"perm": perm_stack} if perm_stack is not None else {}),
            },
        )
        logger.info(
            "ingested %s W4 stack for %s: K=%d N=%d g=%d act_order=%s",
            method, dest, K, N, g, perm_stack is not None,
        )


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



def resolved_shardings(model):
    """Model PartitionSpecs, with the pipeline-stage axis prepended to the
    stacked layer dim when the model runs pipeline-parallel (the layer dim
    IS the stage dim: weights [L, ...] shard over 'pipe' in L/S slabs)."""
    out = model.param_shardings()
    if getattr(model, "pp_size", 1) > 1:
        from jax.sharding import PartitionSpec as _P

        out = dict(out)
        out["layers"] = {
            k: _P("pipe", *tuple(sp)[1:]) for k, sp in out["layers"].items()
        }
    return out


def device_put_params(host_params, model, mesh) -> Dict[str, Any]:
    """Transfer host params to devices with the model's TP shardings."""
    specs = resolved_shardings(model)

    def put_w4(v, spec):
        """W4 stack: q/s/b inherit the dense weight's spec (their K-ish
        dim -2 shrinks but keeps orientation); perm is replicated."""
        from sglang_npu_tpu.layers.quantization import QuantizedWeightW4

        def put_one(arr):
            sp = _validate_spec(arr.shape, spec, mesh)
            return jax.device_put(arr, NamedSharding(mesh, sp))

        perm = v.get("perm")
        return QuantizedWeightW4(
            q=put_one(v["q"]),
            s=put_one(v["s"]),
            b=put_one(v["b"]),
            perm=(
                jax.device_put(perm, NamedSharding(mesh, P()))
                if perm is not None
                else None
            ),
        )

    def put(node, spec_node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict) and v.get("__w4__"):
                spec = spec_node.get(k, P()) if isinstance(spec_node, dict) else P()
                out[k] = put_w4(v, spec)
            elif isinstance(v, dict) and v.get("__w8__"):
                from sglang_npu_tpu.layers.quantization import (
                    QuantizedWeight,
                    QuantizedWeightFP8,
                )

                spec = spec_node.get(k, P()) if isinstance(spec_node, dict) else P()
                cls = (
                    QuantizedWeightFP8
                    if v["__w8__"] == "fp8"
                    else QuantizedWeight
                )
                out[k] = cls(
                    q=jax.device_put(
                        v["q"],
                        NamedSharding(
                            mesh, _validate_spec(v["q"].shape, spec, mesh)
                        ),
                    ),
                    s=jax.device_put(
                        v["s"],
                        NamedSharding(
                            mesh, _validate_spec(v["s"].shape, spec, mesh)
                        ),
                    ),
                )
            elif isinstance(v, dict) and v.get("__fp8b__"):
                from sglang_npu_tpu.layers.quantization import (
                    QuantizedWeightFP8Block,
                )

                spec = spec_node.get(k, P()) if isinstance(spec_node, dict) else P()
                out[k] = QuantizedWeightFP8Block(
                    q=jax.device_put(
                        v["q"],
                        NamedSharding(
                            mesh, _validate_spec(v["q"].shape, spec, mesh)
                        ),
                    ),
                    s=jax.device_put(
                        v["s"],
                        NamedSharding(
                            mesh, _validate_spec(v["s"].shape, spec, mesh)
                        ),
                    ),
                )
            elif isinstance(v, dict):
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


def init_dummy_weights_device(
    model, mesh, seed: int = 0, quantization: Optional[str] = None,
    group_size: int = 128,
) -> Dict[str, Any]:
    """Generate dummy weights directly on the devices (jit with
    out_shardings) — avoids host->device transfer entirely, which matters
    on low-bandwidth links and multi-GB models.

    With ``quantization``, the per-layer matmul weights are emitted
    directly in quantized form (W4/FP8/INT8 + scales): an 8B-class model's
    bf16 dummy weights alone would fill a v5e's HBM before
    `apply_quantization` could shrink them."""
    from sglang_npu_tpu.layers.quantization import (
        QUANT_LAYER_KEYS,
        QuantizedWeight,
        QuantizedWeightFP8,
        QuantizedWeightW4,
    )

    key = jax.random.key(seed)
    specs = resolved_shardings(model)
    counter = [0]

    def make(shape, dtype, sharding, kind="normal"):
        counter[0] += 1
        leaf_key = jax.random.fold_in(key, counter[0])
        if kind == "ones":
            fn = jax.jit(
                lambda _k, s=shape, d=dtype: jnp.ones(s, d),
                out_shardings=sharding,
            )
        elif kind == "nibbles":
            fn = jax.jit(
                lambda _k, s=shape: jax.random.randint(
                    _k, s, 0, 256, dtype=jnp.int32
                ).astype(jnp.uint8),
                out_shardings=sharding,
            )
        elif kind == "int8":
            fn = jax.jit(
                lambda _k, s=shape: jax.random.randint(
                    _k, s, -127, 128, dtype=jnp.int32
                ).astype(jnp.int8),
                out_shardings=sharding,
            )
        elif kind == "const":
            fn = jax.jit(
                lambda _k, s=shape, d=dtype: jnp.full(s, 0.002, d),
                out_shardings=sharding,
            )
        else:
            fn = jax.jit(
                lambda _k, s=shape, d=dtype: (
                    jax.random.normal(_k, s, jnp.float32) * 0.02
                ).astype(d),
                out_shardings=sharding,
            )
        return fn(leaf_key)

    def make_quant(k, shape, dtype, spec):
        """Quantized leaf matching what apply_quantization would produce."""
        K, N = shape[-2], shape[-1]
        lead = tuple(shape[:-2])

        def shard(s):
            return NamedSharding(mesh, _validate_spec(s, spec, mesh))

        if quantization in ("w4a16", "int4", "awq", "gptq", "w4a8") and (
            K % group_size == 0
        ):
            qs = lead + (K // 2, N)
            ss = lead + (K // group_size, N)
            return QuantizedWeightW4(
                q=make(qs, jnp.uint8, shard(qs), "nibbles"),
                s=make(ss, jnp.float32, shard(ss), "const"),
                b=make(ss, jnp.float32, shard(ss), "const"),
            )
        if quantization in ("fp8", "fp8_e4m3"):
            return QuantizedWeightFP8(
                q=make(shape, jnp.float8_e4m3fn, shard(shape)),
                s=make(lead + (1, N), jnp.float32, shard(lead + (1, N)), "const"),
            )
        if quantization in ("int8", "w8a16_int8", "w8a8_int8"):
            return QuantizedWeight(
                q=make(shape, jnp.int8, shard(shape), "int8"),
                s=make(lead + (1, N), jnp.float32, shard(lead + (1, N)), "const"),
            )
        return None

    def init(node, spec_node, in_layers=False):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = init(v, spec_node[k], in_layers or k == "layers")
                continue
            shape, dtype = v
            spec = spec_node.get(k, P()) if isinstance(spec_node, dict) else P()
            spec = _validate_spec(shape, spec, mesh)
            if quantization and in_layers and k in QUANT_LAYER_KEYS:
                qleaf = make_quant(k, shape, dtype, spec)
                if qleaf is not None:
                    out[k] = qleaf
                    continue
            sharding = NamedSharding(mesh, spec)
            out[k] = make(
                shape, dtype, sharding, "ones" if "norm" in k else "normal"
            )
        return out

    return init(model.param_shapes(), specs)


def load_model_weights(
    model, model_path: str, load_format: str, mesh, seed: int = 0,
    quantization: Optional[str] = None,
):
    if load_format == "dummy":
        return init_dummy_weights_device(
            model, mesh, seed, quantization=quantization
        )
    if load_format == "gguf" or model_path.endswith(".gguf"):
        host = load_gguf_weights(model, model_path)
        return device_put_params(host, model, mesh)
    host = load_safetensors_weights(model, model_path)
    return device_put_params(host, model, mesh)


def load_gguf_weights(model, gguf_path: str) -> Dict[str, Any]:
    """Read a GGUF file into stacked host arrays: parse + dequantize the
    container, rename llama.cpp tensors to HF conventions (incl. rope
    un-permute of q/k), then route through the model's HF weight map."""
    from sglang_npu_tpu.model_loader.gguf_loader import (
        gguf_to_hf_tensors,
        read_gguf,
    )

    meta, raw = read_gguf(gguf_path)
    named = gguf_to_hf_tensors(meta, raw)
    host = allocate_host_params(model)
    top_map, per_layer_map = model.hf_weight_map()
    n = 0
    for name, tensor in named.items():
        dest = transform = None
        layer_idx = None
        if name in top_map:
            dest, transform = top_map[name]
        elif name.startswith("model.layers."):
            parts = name.split(".")
            layer_idx = int(parts[2])
            suffix = ".".join(parts[3:])
            if suffix in per_layer_map:
                dest, transform = per_layer_map[suffix]
        if dest is None or not isinstance(dest, str) or ".__expert__" in dest:
            logger.debug("gguf: unmapped HF tensor %s", name)
            continue
        if transform == "transpose":
            tensor = tensor.T
        elif transform == "squeeze":
            tensor = tensor.reshape(-1)
        target = _get_path(host, dest)
        if layer_idx is not None:
            target = target[layer_idx]
        np.copyto(target, tensor.astype(target.dtype))
        n += 1
    # gguf llama omits lm_head when tied; embed doubles as the head
    logger.info("gguf: mapped %d tensors from %s", n, gguf_path)
    return host
