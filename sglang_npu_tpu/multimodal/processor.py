"""Host-side multimodal preprocessing (Qwen2.5-VL first).

Counterpart of the reference's `srt/multimodal/processors/qwen_vl.py` +
`srt/managers/mm_utils.py` padding/hashing, re-shaped for this engine:
the HF AutoProcessor runs in the TokenizerManager thread and produces
  * expanded ``input_ids`` (image pad tokens already repeated),
  * ``pixel_values`` [num_patches, C*tps*ps*ps] and ``image_grid_thw``,
  * radix-cache key ids: pad tokens replaced by content-hash pseudo-ids
    so identical images share prefix KV and different images never do
    (reference hashes items into input ids the same way),
  * mrope positions [3, T] + the decode delta (HF ``get_rope_index``
    behavior re-implemented in numpy — see `mrope_positions`).
"""

from __future__ import annotations

import base64
import hashlib
import io
import logging
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_PROCESSORS: Dict[str, Any] = {}


def get_hf_processor(model_path: str):
    proc = _PROCESSORS.get(model_path)
    if proc is None:
        from transformers import AutoProcessor

        proc = AutoProcessor.from_pretrained(model_path, use_fast=True)
        _PROCESSORS[model_path] = proc
    return proc


def load_image(item) -> "Any":
    """Accept PIL images, file paths, bytes, base64 and data: URIs."""
    from PIL import Image

    if hasattr(item, "convert"):  # PIL
        return item.convert("RGB")
    if isinstance(item, bytes):
        return Image.open(io.BytesIO(item)).convert("RGB")
    if isinstance(item, np.ndarray):
        return Image.fromarray(item).convert("RGB")
    if isinstance(item, str):
        if item.startswith("data:"):
            b64 = item.split(",", 1)[1]
            return Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
        if item.startswith(("http://", "https://")):
            raise ValueError(
                "remote image URLs are not fetchable in this environment; "
                "pass a data: URI, base64, local path, or raw bytes"
            )
        try:
            return Image.open(io.BytesIO(base64.b64decode(item, validate=True))).convert("RGB")
        except Exception:
            return Image.open(item).convert("RGB")
    raise TypeError(f"unsupported image type {type(item)}")


def load_video(item) -> np.ndarray:
    """Video as a frame stack [T, H, W, 3] uint8.  Accepts numpy arrays,
    lists of image-like frames (PIL / bytes / base64 / data: URIs), or a
    .npy path — no video codecs ship in this environment, so callers
    decode containers upstream (reference processors use decord/av)."""
    if isinstance(item, np.ndarray):
        if item.ndim != 4:
            raise ValueError(f"video array must be [T, H, W, C], got {item.shape}")
        return item.astype(np.uint8)
    if isinstance(item, str) and item.endswith(".npy"):
        return load_video(np.load(item))
    if isinstance(item, (list, tuple)):
        frames = [np.asarray(load_image(f)) for f in item]
        return np.stack(frames).astype(np.uint8)
    if isinstance(item, dict) and "frames" in item:
        return load_video(item["frames"])
    raise TypeError(
        f"unsupported video type {type(item)} (pass [T, H, W, 3] frames, "
        "a list of images, or a .npy path)"
    )


def process_images(
    model_path: str,
    prompt_text: Optional[str],
    input_ids: Optional[List[int]],
    images: List[Any],
    hf_config: Dict[str, Any],
    videos: Optional[List[Any]] = None,
) -> Dict[str, Any]:
    """Run the HF processor; returns a MultimodalInputs dict:
    {input_ids, key_ids, pixel_values, image_token_id} plus arch extras
    (qwen2.5-vl: image_grid_thw, mrope_positions, mrope_delta).

    Videos (qwen-vl class, reference `processors/qwen_vl.py` video path):
    frames run the SAME ViT as images (their grid carries t>1); spans are
    combined with image spans in prompt order, mrope gets the temporal
    scaling (tokens_per_second x second_per_grid), and the video pad ids
    are normalized to the image pad id after key hashing so the embed
    splice and radix machinery stay single-id."""
    proc = get_hf_processor(model_path)
    pil = [load_image(im) for im in images] if images else []
    vids = [load_video(v) for v in (videos or [])]
    model_type = hf_config.get("model_type", "")
    if model_type in ("llava", "gemma3", "internvl", "llama4"):
        return _process_fixed_grid(proc, prompt_text, input_ids, pil, hf_config)
    if model_type == "deepseek_vl_v2":
        return _process_deepseek_vl2(
            model_path, prompt_text, input_ids, pil, hf_config
        )
    if model_type == "kimi_vl":
        return _process_kimi_vl(prompt_text, input_ids, pil, hf_config)
    if model_type == "mllama":
        return _process_mllama(proc, prompt_text, input_ids, pil, hf_config)
    vc = hf_config.get("vision_config", {})
    fps = 2.0
    spg_default = vc.get("temporal_patch_size", 2) / fps
    vout = {}
    if prompt_text is None:
        # ids-given path: the caller already expanded vision tokens;
        # only pixel preprocessing is needed
        out = (
            proc.image_processor(images=pil, return_tensors="np")
            if pil
            else {}
        )
        if vids:
            vp = getattr(proc, "video_processor", None)
            if vp is not None:
                vout = vp(videos=vids, return_tensors="np")
            else:
                vout = proc.image_processor(videos=vids, return_tensors="np")
        ids = list(input_ids)
    else:
        out = proc(
            text=[prompt_text],
            images=pil or None,
            videos=vids or None,
            return_tensors="np",
        )
        vout = out
        ids = out["input_ids"][0].tolist()

    image_token_id = hf_config.get("image_token_id") or hf_config.get(
        "image_token_index"
    )
    video_token_id = hf_config.get("video_token_id")
    merge = vc.get("spatial_merge_size", 2)

    img_pix = (
        np.asarray(out["pixel_values"], dtype=np.float32)
        if "pixel_values" in out
        else np.zeros((0, 1), np.float32)
    )
    img_grid = (
        np.asarray(out["image_grid_thw"], dtype=np.int64)
        if "image_grid_thw" in out
        else np.zeros((0, 3), np.int64)
    )
    vid_pix = (
        np.asarray(vout["pixel_values_videos"], dtype=np.float32)
        if "pixel_values_videos" in vout
        else np.zeros((0, 1), np.float32)
    )
    vid_grid = (
        np.asarray(vout["video_grid_thw"], dtype=np.int64)
        if "video_grid_thw" in vout
        else np.zeros((0, 3), np.int64)
    )
    spg = vout.get("second_per_grid_ts")
    spg = (
        [float(x) for x in np.asarray(spg).reshape(-1)]
        if spg is not None
        else [spg_default] * len(vid_grid)
    )

    if not len(vid_grid):
        key_ids = hash_key_ids(ids, image_token_id, img_pix, img_grid, merge)
        pos, delta = mrope_positions(ids, img_grid, hf_config)
        return {
            "input_ids": ids,
            "key_ids": key_ids,
            "pixel_values": img_pix,
            "image_grid_thw": img_grid,
            "mrope_positions": pos,
            "mrope_delta": int(delta),
            "image_token_id": int(image_token_id),
        }

    # span-ordered combination of image + video items
    spans = _vision_spans(ids, image_token_id, video_token_id)
    grids, pixels, kinds, spgs = [], [], [], []
    img_off = vid_off = 0
    img_i = vid_i = 0
    for st, ln, kind in spans:
        if kind == "image":
            g = img_grid[img_i]
            n = int(g[0] * g[1] * g[2])
            pixels.append(img_pix[img_off : img_off + n])
            img_off += n
            img_i += 1
            spgs.append(0.0)
        else:
            g = vid_grid[vid_i]
            n = int(g[0] * g[1] * g[2])
            pixels.append(vid_pix[vid_off : vid_off + n])
            vid_off += n
            spgs.append(spg[vid_i])
            vid_i += 1
        grids.append(np.asarray(g))
        kinds.append(kind)
    grid_thw = np.stack(grids) if grids else np.zeros((0, 3), np.int64)
    pixel_values = (
        np.concatenate(pixels) if pixels else np.zeros((0, 1), np.float32)
    )

    pos, delta = mrope_positions(
        ids, grid_thw, hf_config, kinds=kinds, second_per_grid=spgs
    )
    # hash keys per span (video spans hash their own frames)
    key = list(ids)
    for (st, ln, _k), g, px_i in zip(
        spans, grids, np.cumsum([0] + [int(g[0] * g[1] * g[2]) for g in grids])
    ):
        n = int(g[0] * g[1] * g[2])
        digest = hashlib.sha256(
            pixel_values[px_i : px_i + n].tobytes()
        ).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        pseudo = rng.integers(1 << 30, 1 << 31, size=ln, dtype=np.int64)
        key[st : st + ln] = [int(x) for x in pseudo]
    # normalize video pad ids -> image pad id (those positions are fully
    # replaced by spliced tower embeddings; rope/keys already computed)
    ids = [
        int(image_token_id) if t == video_token_id else int(t) for t in ids
    ]
    return {
        "input_ids": ids,
        "key_ids": key,
        "pixel_values": pixel_values,
        "image_grid_thw": grid_thw,
        "mrope_positions": pos,
        "mrope_delta": int(delta),
        "image_token_id": int(image_token_id),
    }


def _vision_spans(ids, image_token_id, video_token_id):
    """Contiguous runs of image OR video pad tokens, in prompt order."""
    spans = []
    i, n = 0, len(ids)
    while i < n:
        t = ids[i]
        if t == image_token_id or (
            video_token_id is not None and t == video_token_id
        ):
            j = i
            while j < n and ids[j] == t:
                j += 1
            spans.append(
                (i, j - i, "image" if t == image_token_id else "video")
            )
            i = j
        else:
            i += 1
    return spans


def _process_mllama(proc, prompt_text, input_ids, pil, hf_config):
    """Mllama (Llama-3.2-Vision): the <|image|> token is NOT expanded —
    the image enters through cross-attention, not the embedding splice
    (reference `processors/mllama.py`).  The processor yields tiled pixel
    values + aspect-ratio ids/masks; the radix key replaces each image
    token with a content-hash pseudo-id."""
    if prompt_text is None:
        ids = [int(t) for t in input_ids]
        out = proc.image_processor(images=[pil], return_tensors="np")
    else:
        out = proc(text=[prompt_text], images=[pil], return_tensors="np")
        ids = [int(t) for t in out["input_ids"][0]]
    pixel_values = np.asarray(out["pixel_values"], dtype=np.float32)
    aspect_ids = np.asarray(out["aspect_ratio_ids"], dtype=np.int64)
    aspect_mask = np.asarray(out["aspect_ratio_mask"], dtype=np.int64)
    image_token_id = hf_config.get("image_token_index") or hf_config.get(
        "image_token_id"
    )
    key = list(ids)
    pos = [i for i, t in enumerate(ids) if t == image_token_id]
    for n_img, i in enumerate(pos):
        src = pixel_values[0, min(n_img, pixel_values.shape[1] - 1)]
        digest = hashlib.sha256(src.tobytes()).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        key[i] = int(rng.integers(1 << 30, 1 << 31))
    return {
        "input_ids": ids,
        "key_ids": key,
        "pixel_values": pixel_values,
        "aspect_ratio_ids": aspect_ids,
        "aspect_ratio_mask": aspect_mask,
        "image_token_id": int(image_token_id),
    }


def _process_kimi_vl(prompt_text, input_ids, pil, hf_config) -> Dict[str, Any]:
    """Kimi-VL native-resolution packing (hand-ported behavioral spec of
    the remote-code Kimi image processor): each image resizes to a patch
    grid (h, w) — multiples of the 2x2 merge kernel, capped by the
    1024-pixel MaxImageTokenMeta box — and packs into [h*w, 3*ps*ps]
    patch rows (conv-flatten order); the media placeholder expands to
    (h/2)*(w/2) tokens."""
    vc = hf_config.get("vision_config", {}) or {}
    ps = vc.get("patch_size", 14)
    mk = vc.get("merge_kernel_size", (2, 2))
    kh, kw = int(mk[0]), int(mk[1])
    max_g = vc.get("init_pos_emb_height", 64)
    mean = np.asarray(hf_config.get("image_mean", (0.5, 0.5, 0.5)))
    std = np.asarray(hf_config.get("image_std", (0.5, 0.5, 0.5)))
    image_token_id = hf_config.get(
        "media_placeholder_token_id", hf_config.get("image_token_id")
    )

    packs, grids, per_tokens = [], [], []
    for img in pil:
        W, H = img.size
        h = min(max(round(H / ps / kh) * kh, kh), max_g)
        w = min(max(round(W / ps / kw) * kw, kw), max_g)
        a = np.asarray(
            img.convert("RGB").resize((w * ps, h * ps)), np.float32
        ) / 255.0
        a = (a - mean) / std  # [h*ps, w*ps, 3]
        a = a.transpose(2, 0, 1).reshape(3, h, ps, w, ps)
        a = a.transpose(1, 3, 0, 2, 4).reshape(h * w, 3 * ps * ps)
        packs.append(a.astype(np.float32))
        grids.append([h, w])
        per_tokens.append((h // kh) * (w // kw))

    if prompt_text is None:
        ids = list(input_ids)
    else:
        raise ValueError(
            "kimi-vl text-mode processing requires pre-tokenized input_ids"
        )
    n_placeholder = sum(1 for t in ids if t == image_token_id)
    if n_placeholder == len(pil):
        expanded: List[int] = []
        img_i = 0
        for t in ids:
            if t == image_token_id:
                expanded.extend([image_token_id] * per_tokens[img_i])
                img_i += 1
            else:
                expanded.append(int(t))
        ids = expanded
    pixel_values = (
        np.concatenate(packs)
        if packs
        else np.zeros((0, 3 * ps * ps), np.float32)
    )
    key = list(ids)
    spans = _image_spans(ids, image_token_id)
    off = 0
    for n_img, (st, ln) in enumerate(spans):
        T = grids[n_img][0] * grids[n_img][1]
        digest = hashlib.sha256(pixel_values[off : off + T].tobytes()).digest()
        off += T
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        pseudo = rng.integers(1 << 30, 1 << 31, size=ln, dtype=np.int64)
        key[st : st + ln] = [int(x) for x in pseudo]
    return {
        "input_ids": ids,
        "key_ids": key,
        "pixel_values": pixel_values,
        "image_grid_hws": np.asarray(grids, np.int64),
        "image_token_id": int(image_token_id),
    }


def _process_deepseek_vl2(
    model_path, prompt_text, input_ids, pil, hf_config
) -> Dict[str, Any]:
    """DeepSeek-VL2 tiling (hand-ported behavioral spec:
    `srt/configs/deepseekvl2.py tokenize_with_images` — the HF processor
    is remote-code): per image, one padded global view plus best-
    candidate-resolution local tiles; token count =
    h*(w+1) + 1 + (hi*h)*(wi*w+1) with h = w =
    ceil((image_size/patch)/downsample_ratio)."""
    import math

    from PIL import ImageOps

    vc = hf_config.get("vision_config", {}) or {}
    pc = hf_config.get("projector_config", {}) or {}
    S = vc.get("image_size", 384)
    patch = vc.get("patch_size", 14)
    down = int(pc.get("downsample_ratio", 2))
    cands = hf_config.get("candidate_resolutions") or [(S, S)]
    mean = tuple(hf_config.get("image_mean", (0.5, 0.5, 0.5)))
    std = tuple(hf_config.get("image_std", (0.5, 0.5, 0.5)))
    image_token_id = hf_config.get("image_token_id")
    h = w = math.ceil((S // patch) / down)

    def best_res(size):
        # reference select_best_resolution: max effective pixels, then
        # min wasted area
        ow, oh = size
        best, best_fit, best_waste = None, -1, None
        for cw, ch in cands:
            scale = min(cw / ow, ch / oh)
            dw, dh = int(ow * scale), int(oh * scale)
            eff = min(dw * dh, ow * oh)
            waste = cw * ch - eff
            if eff > best_fit or (eff == best_fit and waste < best_waste):
                best, best_fit, best_waste = (cw, ch), eff, waste
        return best

    def transform(img):
        a = np.asarray(img.convert("RGB"), np.float32) / 255.0
        a = (a - np.asarray(mean)) / np.asarray(std)
        return a.transpose(2, 0, 1)

    tiles, crops, per_image_tokens = [], [], []
    fill = tuple(int(x * 255) for x in mean)
    for img in pil:
        bw, bh = best_res(img.size)
        g = ImageOps.pad(img, (S, S), color=fill)
        tiles.append(transform(g))
        loc = ImageOps.pad(img, (bw, bh), color=fill)
        for i in range(0, bh, S):
            for j in range(0, bw, S):
                tiles.append(transform(loc.crop((j, i, j + S, i + S))))
        wi, hi = bw // S, bh // S
        crops.append([wi, hi])
        per_image_tokens.append(h * (w + 1) + 1 + (hi * h) * (wi * w + 1))

    if prompt_text is None:
        ids = list(input_ids)
    else:
        from sglang_npu_tpu.tokenizer import get_tokenizer

        tok = get_tokenizer(model_path)
        pieces = prompt_text.split("<image>")
        ids = []
        for i, piece in enumerate(pieces):
            ids += tok.encode(piece) if piece else []
            if i < len(pieces) - 1:
                ids += [image_token_id]
    # expand single placeholders to the per-image token counts
    n_placeholder = sum(1 for t in ids if t == image_token_id)
    if n_placeholder == len(pil):
        expanded: List[int] = []
        img_i = 0
        for t in ids:
            if t == image_token_id:
                expanded.extend([image_token_id] * per_image_tokens[img_i])
                img_i += 1
            else:
                expanded.append(int(t))
        ids = expanded
    pixel_values = (
        np.stack(tiles).astype(np.float32)
        if tiles
        else np.zeros((0, 3, S, S), np.float32)
    )
    key = list(ids)
    spans = _image_spans(ids, image_token_id)
    off = 0
    for n_img, (st, ln) in enumerate(spans):
        n_tiles = 1 + crops[n_img][0] * crops[n_img][1]
        digest = hashlib.sha256(
            pixel_values[off : off + n_tiles].tobytes()
        ).digest()
        off += n_tiles
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        pseudo = rng.integers(1 << 30, 1 << 31, size=ln, dtype=np.int64)
        key[st : st + ln] = [int(x) for x in pseudo]
    return {
        "input_ids": ids,
        "key_ids": key,
        "pixel_values": pixel_values,
        "images_spatial_crop": np.asarray(crops, np.int64),
        "image_token_id": int(image_token_id),
    }


def _process_fixed_grid(
    proc, prompt_text, input_ids, pil, hf_config
) -> Dict[str, Any]:
    """Fixed-resolution towers (llava CLIP, gemma3 SigLIP): every image
    contributes a constant number of placeholder tokens."""
    ip = getattr(proc, "image_processor", proc)
    out = ip(images=pil, return_tensors="np")
    pixel_values = np.asarray(out["pixel_values"], dtype=np.float32)
    image_token_id = hf_config.get("image_token_index") or hf_config.get(
        "image_token_id"
    )
    model_type = hf_config.get("model_type", "")
    vc = hf_config.get("vision_config", {})
    if model_type == "gemma3":
        per_image = int(hf_config.get("mm_tokens_per_image", 256))
    elif model_type == "internvl":
        img = vc.get("image_size", [448, 448])
        img = img[0] if isinstance(img, (list, tuple)) else img
        pt = vc.get("patch_size", [14, 14])
        pt = pt[0] if isinstance(pt, (list, tuple)) else pt
        ds = hf_config.get("downsample_ratio", 0.5)
        per_image = int(img // pt * ds) ** 2
    elif model_type == "llama4":
        # one resized chunk per image; pixel-shuffle packs r^2 patches
        r = vc.get("pixel_shuffle_ratio", 0.5)
        per_image = int(
            vc.get("image_size", 448) // vc.get("patch_size", 14) * r
        ) ** 2
    else:
        per_image = (
            vc.get("image_size", 336) // vc.get("patch_size", 14)
        ) ** 2
        if hf_config.get("vision_feature_select_strategy") == "full":
            per_image += 1
    if prompt_text is None:
        ids = list(input_ids)
    else:
        tok = getattr(proc, "tokenizer", None)
        if tok is not None:
            ids = tok([prompt_text])["input_ids"][0]
        else:
            ids = proc(text=[prompt_text], return_tensors="np")["input_ids"][
                0
            ].tolist()
    # expand unexpanded single placeholders (HF processors differ by
    # version on whether text expansion already happened)
    n_placeholder = sum(1 for t in ids if t == image_token_id)
    if n_placeholder == len(pil):
        expanded: List[int] = []
        for t in ids:
            if t == image_token_id:
                expanded.extend([image_token_id] * per_image)
            else:
                expanded.append(int(t))
        ids = expanded
    else:
        ids = [int(t) for t in ids]

    # radix keys: hash each image's pixels over its placeholder span
    key = list(ids)
    spans = _image_spans(ids, image_token_id)
    for n_img, (st, ln) in enumerate(spans):
        digest = hashlib.sha256(pixel_values[n_img].tobytes()).digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.default_rng(seed)
        pseudo = rng.integers(1 << 30, 1 << 31, size=ln, dtype=np.int64)
        key[st : st + ln] = [int(x) for x in pseudo]
    return {
        "input_ids": ids,
        "key_ids": key,
        "pixel_values": pixel_values,
        "image_token_id": int(image_token_id),
    }


def hash_key_ids(
    ids: List[int],
    image_token_id: int,
    pixel_values: np.ndarray,
    grid_thw: np.ndarray,
    merge: int,
) -> List[int]:
    """Radix-cache key: image pad tokens replaced by pseudo-ids derived
    from the image content hash (reference `MultimodalDataItem.hash` use
    in `pad_input_tokens`)."""
    key = list(ids)
    spans = _image_spans(ids, image_token_id)
    off = 0
    for n_img, (st, ln) in enumerate(spans):
        t, h, w = grid_thw[n_img]
        n_patch = int(t * h * w)
        img_pixels = pixel_values[off : off + n_patch]
        off += n_patch
        digest = hashlib.sha256(img_pixels.tobytes()).digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.default_rng(seed)
        pseudo = rng.integers(1 << 30, 1 << 31, size=ln, dtype=np.int64)
        key[st : st + ln] = [int(x) for x in pseudo]
    return key


def _image_spans(ids: List[int], image_token_id: int) -> List[Tuple[int, int]]:
    """Contiguous runs of the image pad token, in order."""
    spans = []
    i, n = 0, len(ids)
    while i < n:
        if ids[i] == image_token_id:
            j = i
            while j < n and ids[j] == image_token_id:
                j += 1
            spans.append((i, j - i))
            i = j
        else:
            i += 1
    return spans


def mrope_positions(
    ids: List[int],
    grid_thw: np.ndarray,
    hf_config: Dict[str, Any],
    kinds: Optional[List[str]] = None,
    second_per_grid: Optional[List[float]] = None,
) -> Tuple[np.ndarray, int]:
    """3D rope positions for one sequence (numpy re-implementation of the
    HF `Qwen2_5_VLModel.get_rope_index` single-sequence behavior).
    Video spans get the temporal scaling t_idx = floor(t * spg * tps)
    (qwen2.5-vl; qwen2-vl has tokens_per_second unset -> plain t).
    Returns (positions [3, T] int32, delta)."""
    image_token_id = hf_config.get("image_token_id") or hf_config.get(
        "image_token_index"
    )
    video_token_id = hf_config.get("video_token_id")
    vc = hf_config.get("vision_config", {})
    merge = vc.get("spatial_merge_size", 2)
    tps = vc.get("tokens_per_second")
    T = len(ids)
    if kinds is None:
        spans3 = [
            (st, ln, "image") for st, ln in _image_spans(ids, image_token_id)
        ]
    else:
        spans3 = _vision_spans(ids, image_token_id, video_token_id)
    pos = np.zeros((3, T), dtype=np.int32)
    cursor = 0  # index into ids
    next_pos = 0
    for n_img, (st, ln, kind) in enumerate(spans3):
        text_len = st - cursor
        if text_len:
            r = np.arange(next_pos, next_pos + text_len, dtype=np.int32)
            pos[:, cursor:st] = r
            next_pos += text_len
        t, h, w = (int(v) for v in grid_thw[n_img])
        gh, gw = h // merge, w // merge
        assert ln == t * gh * gw, (ln, t, gh, gw)
        t_range = np.arange(t, dtype=np.float64)
        if kind == "video" and tps:
            spg = (
                second_per_grid[n_img]
                if second_per_grid is not None
                else 1.0
            )
            t_range = np.floor(t_range * float(spg) * float(tps))
        t_idx = np.repeat(t_range.astype(np.int32), gh * gw)
        h_idx = np.tile(np.repeat(np.arange(gh, dtype=np.int32), gw), t)
        w_idx = np.tile(np.arange(gw, dtype=np.int32), t * gh)
        pos[0, st : st + ln] = t_idx + next_pos
        pos[1, st : st + ln] = h_idx + next_pos
        pos[2, st : st + ln] = w_idx + next_pos
        next_pos += int(max(int(t_idx.max()) + 1, gh, gw))
        cursor = st + ln
    if cursor < T:
        r = np.arange(next_pos, next_pos + (T - cursor), dtype=np.int32)
        pos[:, cursor:] = r
        next_pos += T - cursor
    delta = int(pos.max()) + 1 - T
    return pos, delta


def extend_mrope(pos: np.ndarray, delta: int, new_len: int) -> np.ndarray:
    """Extend stored prompt positions for generated tokens (all three rows
    advance together: seq_pos + delta)."""
    T = pos.shape[1]
    if new_len <= T:
        return pos
    extra = np.arange(T, new_len, dtype=np.int32) + delta
    return np.concatenate([pos, np.tile(extra, (3, 1))], axis=1)


# ----------------------------------------------------------------------
# Audio (qwen2-audio): log-mel feature extraction + placeholder expansion
# ----------------------------------------------------------------------
def load_audio(item) -> np.ndarray:
    """Raw waveform as float32 [T] — accepts arrays/lists, wav paths."""
    if isinstance(item, np.ndarray):
        return item.astype(np.float32)
    if isinstance(item, (list, tuple)):
        return np.asarray(item, dtype=np.float32)
    if isinstance(item, str):
        try:
            import soundfile as sf  # optional

            data, _sr = sf.read(item, dtype="float32")
            return data if data.ndim == 1 else data.mean(-1)
        except ImportError:
            import wave

            with wave.open(item, "rb") as w:
                raw = np.frombuffer(
                    w.readframes(w.getnframes()), dtype=np.int16
                )
                if w.getnchannels() > 1:
                    raw = raw.reshape(-1, w.getnchannels()).mean(-1)
            return raw.astype(np.float32) / 32768.0
    raise TypeError(f"unsupported audio type {type(item)}")


def process_audios(
    model_path: str,
    prompt_text: Optional[str],
    input_ids: Optional[List[int]],
    audios: List[Any],
    hf_config: Dict[str, Any],
) -> Dict[str, Any]:
    """Whisper-style feature extraction + placeholder expansion for
    qwen2-audio-class models.  Each single audio placeholder token in the
    prompt expands to that audio's post-pool token count (reference
    `multimodal/processors/qwen_audio.py`)."""
    from sglang_npu_tpu.models.qwen2_audio import audio_out_lengths

    proc = get_hf_processor(model_path)
    fe = getattr(proc, "feature_extractor", proc)
    waves = [load_audio(a) for a in audios]
    sr = getattr(fe, "sampling_rate", 16000)
    out = fe(
        waves, sampling_rate=sr, return_attention_mask=True,
        padding="max_length", return_tensors="np",
    )
    feats = np.asarray(out["input_features"], dtype=np.float32)
    fam = np.asarray(out["attention_mask"])
    _, out_lens = audio_out_lengths(fam.sum(-1))

    audio_token_id = hf_config.get("audio_token_id") or hf_config.get(
        "audio_token_index"
    )
    if prompt_text is None:
        ids = [int(t) for t in input_ids]
    else:
        tok = getattr(proc, "tokenizer", None)
        ids = tok([prompt_text])["input_ids"][0]
    # expand single placeholders to per-audio token counts
    n_placeholder = sum(1 for t in ids if t == audio_token_id)
    if n_placeholder == len(waves):
        expanded: List[int] = []
        a = 0
        for t in ids:
            if t == audio_token_id:
                expanded.extend([int(audio_token_id)] * int(out_lens[a]))
                a += 1
            else:
                expanded.append(int(t))
        ids = expanded
    # radix keys: per-audio feature hash over its placeholder span
    key = list(ids)
    spans = _image_spans(ids, audio_token_id)
    for n_a, (st, ln) in enumerate(spans):
        digest = hashlib.sha256(feats[n_a].tobytes()).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        pseudo = rng.integers(1 << 30, 1 << 31, size=ln, dtype=np.int64)
        key[st : st + ln] = [int(x) for x in pseudo]
    return {
        "input_ids": ids,
        "key_ids": key,
        "input_features": feats,
        "feature_attention_mask": fam,
        "image_token_id": int(audio_token_id),  # generic splice id
    }
