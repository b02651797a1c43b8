"""Multi-LoRA serving.

Counterpart of the reference's `srt/lora/` (`LoRAManager:46`, unified GPU
A/B pools, batched segmented GEMM triton kernels): adapters are stacked into
`[num_adapters, L, in, r]` / `[num_adapters, L, r, out]` device arrays
(slot 0 = identity/no-adapter, zeros) and applied per request with a
batched gather + two thin einsums — fully batched, CUDA-graph-free, jit
bucket compatible.  Loads PEFT-format checkpoints
(`adapter_config.json` + `adapter_model.safetensors`).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

# peft module name -> our stacked weight key + (in_dim attr, out_dim attr)
TARGET_MAP = {
    "q_proj": "wq",
    "k_proj": "wk",
    "v_proj": "wv",
    "o_proj": "wo",
    "gate_proj": "w_gate",
    "up_proj": "w_up",
    "down_proj": "w_down",
}


class LoRAManager:
    def __init__(self, lora_paths: List[str], model, mesh):
        """lora_paths entries: "name=path" or bare path (name = basename).
        May be empty (--enable-lora with no adapters: dynamic-only)."""
        self.model = model
        self.mesh = mesh
        self.name_to_id: Dict[str, int] = {}
        # slot s (1-based id s+1) -> adapter path or None (freed slot);
        # slot id 0 = no adapter
        self.slots: List[Optional[str]] = []
        for spec in lora_paths:
            if "=" in spec:
                name, path = spec.split("=", 1)
            else:
                name, path = os.path.basename(spec.rstrip("/")), spec
            self.slots.append(path)
            self.name_to_id[name] = len(self.slots)
            self.name_to_id[path] = len(self.slots)

    def lora_id(self, lora_path: Optional[str]) -> int:
        if not lora_path:
            return 0
        return self.name_to_id.get(lora_path, 0)

    # ------------------------------------------------------------------
    # Dynamic load/unload (reference `/load_lora_adapter` /
    # `/unload_lora_adapter`, `http_server.py:625-643`).  A freed slot is
    # reused when possible (no shape change -> no jit recompile); a new
    # slot grows the stacked adapter dim (one-time recompile).
    # ------------------------------------------------------------------
    def add(self, name: str, path: str):
        sid = self.name_to_id.get(name)
        if sid is not None and self.slots[sid - 1] is not None:
            return False, f"adapter {name!r} already loaded (slot {sid})"
        if not os.path.exists(os.path.join(path, "adapter_config.json")):
            return False, f"no adapter_config.json under {path!r}"
        for i, p in enumerate(self.slots):
            if p is None:
                self.slots[i] = path
                sid = i + 1
                break
        else:
            self.slots.append(path)
            sid = len(self.slots)
        self.name_to_id[name] = sid
        self.name_to_id[path] = sid
        return True, f"loaded adapter {name!r} into slot {sid}"

    def remove(self, name: str):
        sid = self.name_to_id.get(name)
        if sid is None or self.slots[sid - 1] is None:
            return False, f"unknown adapter {name!r}"
        path = self.slots[sid - 1]
        self.slots[sid - 1] = None
        self.name_to_id.pop(name, None)
        self.name_to_id.pop(path, None)
        return True, f"unloaded adapter {name!r} (slot {sid} freed)"

    # ------------------------------------------------------------------
    def build_params(self) -> Dict[str, object]:
        """Returns {layer-key additions + 'lora_scaling'} to merge into the
        model param tree."""
        from safetensors import safe_open

        shapes = self.model.param_shapes()["layers"]
        L = shapes["wq"][0][0]
        n = len(self.slots) + 1

        # discover max rank + targets (freed slots contribute zeros)
        adapters = []
        max_rank = 1
        for path in self.slots:
            if path is None:
                adapters.append(None)
                continue
            with open(os.path.join(path, "adapter_config.json")) as f:
                cfg = json.load(f)
            rank = cfg["r"]
            alpha = cfg.get("lora_alpha", rank)
            max_rank = max(max_rank, rank)
            tensors = {}
            st = os.path.join(path, "adapter_model.safetensors")
            with safe_open(st, framework="np") as f:
                for key in f.keys():
                    tensors[key] = f.get_tensor(key)
            adapters.append((cfg, rank, alpha, tensors))

        out: Dict[str, object] = {}
        scaling = np.zeros((n,), np.float32)
        for i, ad in enumerate(adapters):
            if ad is not None:
                scaling[i + 1] = ad[2] / ad[1]
        host: Dict[str, np.ndarray] = {}
        for mod, wkey in TARGET_MAP.items():
            if wkey not in shapes:
                continue
            (Lk, din, dout), _dt = shapes[wkey]
            host[f"lora_{wkey}_a"] = np.zeros((Lk, n, din, max_rank), np.float32)
            host[f"lora_{wkey}_b"] = np.zeros((Lk, n, max_rank, dout), np.float32)

        n_loaded = 0
        for i, ad in enumerate(adapters):
            if ad is None:
                continue
            _cfg, rank, _alpha, tensors = ad
            for key, t in tensors.items():
                # ...model.layers.{l}.self_attn.q_proj.lora_A.weight
                parts = key.split(".")
                try:
                    li = parts.index("layers")
                    layer = int(parts[li + 1])
                    mod = parts[li + 3]
                    ab = parts[li + 4]
                except (ValueError, IndexError):
                    continue
                wkey = TARGET_MAP.get(mod)
                if wkey is None or f"lora_{wkey}_a" not in host:
                    continue
                if ab == "lora_A":
                    # peft stores A as [r, in]; we use [in, r]
                    host[f"lora_{wkey}_a"][layer, i + 1, :, :rank] = t.T
                elif ab == "lora_B":
                    # peft B is [out, r]; we use [r, out]
                    host[f"lora_{wkey}_b"][layer, i + 1, :rank, :] = t.T
                n_loaded += 1
        logger.info(
            "loaded %d LoRA tensors from %d adapters (max rank %d)",
            n_loaded,
            len(adapters),
            max_rank,
        )

        repl = NamedSharding(self.mesh, P())
        for k, v in host.items():
            out[k] = jax.device_put(jnp.asarray(v, jnp.float32), repl)
        out["__scaling__"] = jax.device_put(jnp.asarray(scaling), repl)
        return out


def apply_lora(x, out, lp, wkey, lora_ids, scaling):
    """out += scaling[id_b] * (x @ A[id_b]) @ B[id_b] per batch row."""
    a = lp[f"lora_{wkey}_a"][lora_ids]  # [B, in, r]
    b = lp[f"lora_{wkey}_b"][lora_ids]  # [B, r, out]
    s = scaling[lora_ids][:, None, None]
    xr = jnp.einsum(
        "bed,bdr->ber", x.astype(jnp.float32), a
    )
    delta = jnp.einsum("ber,bro->beo", xr * s, b)
    return out + delta.astype(out.dtype)
