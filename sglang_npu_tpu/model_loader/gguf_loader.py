"""GGUF checkpoint ingestion (llama-family).

Counterpart of the reference's gguf load format
(`srt/model_loader/loader.py GGUFModelLoader` + vllm's gguf weight
iterator): parses the GGUF v2/v3 container directly (no gguf package in
the image), synthesizes the HF config from GGUF metadata, maps llama.cpp
tensor names back to HF names, un-permutes the rope-interleaved Q/K
projections, and dequantizes the common tensor types.

Supported tensor encodings: F32, F16, BF16, Q8_0 (block-32 int8 with
fp16 scales).  K-quants are rejected with a clear error — requantize to
Q8_0 or use safetensors for those.

A `write_gguf` helper exists for round-trip tests (this environment has
no egress to fetch real GGUF files).
"""

from __future__ import annotations

import logging
import struct
from typing import Any, Dict, List, Tuple

import numpy as np

logger = logging.getLogger(__name__)

MAGIC = b"GGUF"

# metadata value types
(T_U8, T_I8, T_U16, T_I16, T_U32, T_I32, T_F32, T_BOOL, T_STR, T_ARR,
 T_U64, T_I64, T_F64) = range(13)

_SCALAR_FMT = {
    T_U8: "<B", T_I8: "<b", T_U16: "<H", T_I16: "<h", T_U32: "<I",
    T_I32: "<i", T_F32: "<f", T_BOOL: "<?", T_U64: "<Q", T_I64: "<q",
    T_F64: "<d",
}

# tensor encodings (ggml_type)
GGML_F32, GGML_F16 = 0, 1
GGML_Q8_0 = 8
GGML_BF16 = 30


class _Reader:
    def __init__(self, data: memoryview):
        self.d = data
        self.o = 0

    def read(self, n: int) -> memoryview:
        v = self.d[self.o:self.o + n]
        self.o += n
        return v

    def scalar(self, t: int):
        fmt = _SCALAR_FMT[t]
        n = struct.calcsize(fmt)
        return struct.unpack(fmt, self.read(n))[0]

    def string(self) -> str:
        n = self.scalar(T_U64)
        return bytes(self.read(n)).decode("utf-8", "replace")

    def value(self, t: int):
        if t == T_STR:
            return self.string()
        if t == T_ARR:
            et = self.scalar(T_U32)
            n = self.scalar(T_U64)
            return [self.value(et) for _ in range(n)]
        return self.scalar(t)


def read_gguf(path: str) -> Tuple[Dict[str, Any], Dict[str, np.ndarray]]:
    """Returns (metadata, {tensor_name: np.ndarray [HF row-major]})."""
    with open(path, "rb") as f:
        data = memoryview(f.read())
    r = _Reader(data)
    if bytes(r.read(4)) != MAGIC:
        raise ValueError(f"{path} is not a GGUF file")
    version = r.scalar(T_U32)
    if version not in (2, 3):
        raise ValueError(f"unsupported GGUF version {version}")
    n_tensors = r.scalar(T_U64)
    n_kv = r.scalar(T_U64)
    meta: Dict[str, Any] = {}
    for _ in range(n_kv):
        key = r.string()
        t = r.scalar(T_U32)
        meta[key] = r.value(t)
    infos: List[Tuple[str, List[int], int, int]] = []
    for _ in range(n_tensors):
        name = r.string()
        nd = r.scalar(T_U32)
        dims = [r.scalar(T_U64) for _ in range(nd)]  # ne[0] innermost
        ttype = r.scalar(T_U32)
        offset = r.scalar(T_U64)
        infos.append((name, dims, ttype, offset))
    align = int(meta.get("general.alignment", 32))
    base = (r.o + align - 1) // align * align

    tensors: Dict[str, np.ndarray] = {}
    for name, dims, ttype, offset in infos:
        n_elems = int(np.prod(dims))
        shape = tuple(reversed(dims))  # HF row-major [out, ..., in]
        start = base + offset
        if ttype == GGML_F32:
            arr = np.frombuffer(data, np.float32, n_elems, start)
        elif ttype == GGML_F16:
            arr = np.frombuffer(data, np.float16, n_elems, start)
        elif ttype == GGML_BF16:
            import ml_dtypes

            arr = np.frombuffer(
                data, ml_dtypes.bfloat16, n_elems, start
            )
        elif ttype == GGML_Q8_0:
            # blocks of 32: fp16 scale + 32 int8
            nb = n_elems // 32
            raw = np.frombuffer(data, np.uint8, nb * 34, start).reshape(
                nb, 34
            )
            scales = raw[:, :2].copy().view(np.float16).astype(np.float32)
            q = raw[:, 2:].copy().view(np.int8).astype(np.float32)
            arr = (q * scales).reshape(-1)
        else:
            raise ValueError(
                f"tensor {name!r}: GGML type {ttype} not supported "
                "(F32/F16/BF16/Q8_0 only — requantize or use safetensors)"
            )
        tensors[name] = np.asarray(arr, np.float32).reshape(shape)
    logger.info(
        "gguf: %d tensors, %d metadata keys (v%d)",
        len(tensors), len(meta), version,
    )
    return meta, tensors


def gguf_to_hf_config(
    meta: Dict[str, Any], tensor_names=None
) -> Dict[str, Any]:
    """Synthesize the HF config dict from GGUF metadata keys."""
    arch = meta.get("general.architecture", "llama")
    if arch not in ("llama", "mistral", "qwen2"):
        raise ValueError(f"gguf architecture {arch!r} not supported")
    p = arch

    def g(key, default=None):
        return meta.get(f"{p}.{key}", default)

    heads = int(g("attention.head_count"))
    hidden = int(g("embedding_length"))
    cfg = {
        "architectures": (
            ["Qwen2ForCausalLM"] if arch == "qwen2"
            else ["LlamaForCausalLM"]
        ),
        "model_type": arch,
        "vocab_size": int(
            g("vocab_size", len(meta.get("tokenizer.ggml.tokens", [])) or 32000)
        ),
        "hidden_size": hidden,
        "num_hidden_layers": int(g("block_count")),
        "num_attention_heads": heads,
        "num_key_value_heads": int(g("attention.head_count_kv", heads)),
        "intermediate_size": int(g("feed_forward_length")),
        "max_position_embeddings": int(g("context_length", 4096)),
        "rms_norm_eps": float(
            g("attention.layer_norm_rms_epsilon", 1e-5)
        ),
        "rope_theta": float(g("rope.freq_base", 10000.0)),
        "torch_dtype": "bfloat16",
    }
    if tensor_names is not None:
        # gguf omits output.weight when the head ties to the embedding
        cfg["tie_word_embeddings"] = "output.weight" not in tensor_names
    return cfg


def _unpermute(w: np.ndarray, n_head: int) -> np.ndarray:
    """Invert convert_hf_to_gguf.py's rope permutation of Q/K rows."""
    out, rest = w.shape[0], w.shape[1:]
    dh = out // n_head
    return (
        w.reshape(n_head, 2, dh // 2, *rest)
        .swapaxes(1, 2)
        .reshape(out, *rest)
    )


# llama.cpp name -> (HF name template, needs_unpermute_heads_key)
_NAME_MAP = {
    "token_embd.weight": ("model.embed_tokens.weight", None),
    "output.weight": ("lm_head.weight", None),
    "output_norm.weight": ("model.norm.weight", None),
    "blk.{i}.attn_q.weight": ("model.layers.{i}.self_attn.q_proj.weight", "q"),
    "blk.{i}.attn_k.weight": ("model.layers.{i}.self_attn.k_proj.weight", "k"),
    "blk.{i}.attn_v.weight": ("model.layers.{i}.self_attn.v_proj.weight", None),
    "blk.{i}.attn_output.weight": (
        "model.layers.{i}.self_attn.o_proj.weight", None),
    "blk.{i}.attn_norm.weight": (
        "model.layers.{i}.input_layernorm.weight", None),
    "blk.{i}.ffn_norm.weight": (
        "model.layers.{i}.post_attention_layernorm.weight", None),
    "blk.{i}.ffn_gate.weight": ("model.layers.{i}.mlp.gate_proj.weight", None),
    "blk.{i}.ffn_up.weight": ("model.layers.{i}.mlp.up_proj.weight", None),
    "blk.{i}.ffn_down.weight": ("model.layers.{i}.mlp.down_proj.weight", None),
    "blk.{i}.attn_q.bias": ("model.layers.{i}.self_attn.q_proj.bias", "q"),
    "blk.{i}.attn_k.bias": ("model.layers.{i}.self_attn.k_proj.bias", "k"),
    "blk.{i}.attn_v.bias": ("model.layers.{i}.self_attn.v_proj.bias", None),
}


def gguf_to_hf_tensors(meta, tensors) -> Dict[str, np.ndarray]:
    """Rename to HF conventions; un-permute rope-interleaved q/k."""
    arch = meta.get("general.architecture", "llama")
    n_head = int(meta[f"{arch}.attention.head_count"])
    n_kv = int(meta.get(f"{arch}.attention.head_count_kv", n_head))
    out: Dict[str, np.ndarray] = {}
    for name, arr in tensors.items():
        hf = perm = None
        if name in _NAME_MAP:
            hf, perm = _NAME_MAP[name]
        elif name.startswith("blk."):
            parts = name.split(".")
            generic = f"blk.{{i}}.{'.'.join(parts[2:])}"
            if generic in _NAME_MAP:
                tpl, perm = _NAME_MAP[generic]
                hf = tpl.format(i=parts[1])
            else:
                hf = None
        if hf is None:
            logger.debug("gguf: skipping unmapped tensor %s", name)
            continue
        if perm == "q":
            arr = _unpermute(arr, n_head)
        elif perm == "k":
            arr = _unpermute(arr, n_kv)
        out[hf] = arr
    return out


# ----------------------------------------------------------------------
# minimal writer (round-trip tests; no real GGUF files reachable offline)
# ----------------------------------------------------------------------
def _write_str(f, s: str):
    b = s.encode()
    f.write(struct.pack("<Q", len(b)))
    f.write(b)


def write_gguf(path: str, meta: Dict[str, Any], tensors: Dict[str, np.ndarray],
               q8_names=()):
    """Write a GGUF v3 file (F32 tensors; names in ``q8_names`` encode as
    Q8_0)."""
    import io

    infos = []
    blob = io.BytesIO()
    align = 32
    for name, arr in tensors.items():
        arr = np.asarray(arr, np.float32)
        off = blob.tell()
        pad = (-off) % align
        blob.write(b"\0" * pad)
        off += pad
        if name in q8_names:
            flat = arr.reshape(-1)
            assert flat.size % 32 == 0, f"{name}: Q8_0 needs %32 elems"
            blocks = flat.reshape(-1, 32)
            scales = (
                np.abs(blocks).max(axis=1) / 127.0
            ).astype(np.float32)
            scales = np.maximum(scales, 1e-12)
            q = np.clip(
                np.round(blocks / scales[:, None]), -127, 127
            ).astype(np.int8)
            for s, row in zip(scales.astype(np.float16), q):
                blob.write(s.tobytes())
                blob.write(row.tobytes())
            ttype = GGML_Q8_0
        else:
            blob.write(arr.tobytes())
            ttype = GGML_F32
        dims = list(reversed(arr.shape))  # ne[0] innermost
        infos.append((name, dims, ttype, off))

    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<Q", len(infos)))
        f.write(struct.pack("<Q", len(meta)))
        for k, v in meta.items():
            _write_str(f, k)
            if isinstance(v, bool):
                f.write(struct.pack("<I", T_BOOL))
                f.write(struct.pack("<?", v))
            elif isinstance(v, int):
                f.write(struct.pack("<I", T_U32))
                f.write(struct.pack("<I", v))
            elif isinstance(v, float):
                f.write(struct.pack("<I", T_F32))
                f.write(struct.pack("<f", v))
            elif isinstance(v, str):
                f.write(struct.pack("<I", T_STR))
                _write_str(f, v)
            else:
                raise TypeError(type(v))
        for name, dims, ttype, off in infos:
            _write_str(f, name)
            f.write(struct.pack("<I", len(dims)))
            for d in dims:
                f.write(struct.pack("<Q", d))
            f.write(struct.pack("<I", ttype))
            f.write(struct.pack("<Q", off))
        pos = f.tell()
        f.write(b"\0" * ((-pos) % align))
        f.write(blob.getvalue())
