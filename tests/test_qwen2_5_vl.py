"""Qwen2.5-VL end-to-end: ViT (window attention, 2D rope, merger), mrope
LM, embedding splice — greedy parity vs HF on a tiny random-weight model
(reference `srt/models/qwen2_5_vl.py`, `multimodal/processors/qwen_vl.py`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
PIL = pytest.importorskip("PIL")
from PIL import Image

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 600  # > image_token_id fixtures below


@pytest.fixture(scope="module")
def vl_setup(tmp_path_factory):
    vision = dict(
        depth=4,
        hidden_size=64,
        intermediate_size=128,
        num_heads=4,
        patch_size=14,
        temporal_patch_size=2,
        spatial_merge_size=2,
        window_size=28,  # 1 merge-group per window side -> real windowing
        fullatt_block_indexes=[2],
        out_hidden_size=48,
        in_channels=3,
        tokens_per_second=2,
    )
    text = dict(
        vocab_size=VOCAB,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        use_sliding_window=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        tie_word_embeddings=False,
    )
    cfg = transformers.Qwen2_5_VLConfig(
        text_config=text,
        vision_config=vision,
        image_token_id=595,
        video_token_id=596,
        vision_start_token_id=593,
        vision_end_token_id=594,
        eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.Qwen2_5_VLForConditionalGeneration(cfg)
    hf = hf.float().eval()
    d = tmp_path_factory.mktemp("qwen25vl")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    yield hf, e, cfg
    e.shutdown()


def make_pixels(cfg, w=28, h=28, seed=0):
    """A tiny image preprocessed HF-style: returns (pixel_values np,
    grid_thw np)."""
    vc = cfg.vision_config
    rng = np.random.default_rng(seed)
    gh, gw = h // vc.patch_size, w // vc.patch_size
    t = 1
    n = t * gh * gw
    pix = rng.standard_normal(
        (n, vc.in_channels * vc.temporal_patch_size * vc.patch_size**2)
    ).astype(np.float32)
    return pix, np.array([[t, gh, gw]], dtype=np.int64)


def build_ids(cfg, grid, n_text=6, seed=1):
    rng = np.random.default_rng(seed)
    merge = cfg.vision_config.spatial_merge_size
    n_img = int(grid[0, 0] * grid[0, 1] // merge * grid[0, 2] // merge)
    pre = rng.integers(3, 290, size=n_text).tolist()
    ids = (
        pre
        + [cfg.vision_start_token_id]
        + [cfg.image_token_id] * n_img
        + [cfg.vision_end_token_id]
        + rng.integers(3, 290, size=4).tolist()
    )
    return ids


def hf_greedy(hf, ids, pixel_values, grid, n):
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pixel_values),
            image_grid_thw=torch.tensor(grid),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=n,
            do_sample=False,
            eos_token_id=None,
            pad_token_id=0,
        )
    return out[0][len(ids):].tolist()


def engine_generate(e, cfg, ids, pixel_values, grid, n):
    """Drive the engine through the tokenized-request path with a
    preprocessed mm payload (bypasses the HF processor, which needs a
    full tokenizer dir)."""
    from sglang_npu_tpu.multimodal.processor import hash_key_ids, mrope_positions

    hf_dict = cfg.to_dict()
    merged = dict(hf_dict)
    for k, v in hf_dict["text_config"].items():
        if merged.get(k) is None:
            merged[k] = v
    pos, delta = mrope_positions(ids, grid, merged)
    mm = {
        "input_ids": ids,
        "key_ids": hash_key_ids(
            ids, cfg.image_token_id, pixel_values, grid,
            cfg.vision_config.spatial_merge_size,
        ),
        "pixel_values": pixel_values,
        "image_grid_thw": grid,
        "mrope_positions": pos,
        "mrope_delta": delta,
        "image_token_id": cfg.image_token_id,
    }
    from sglang_npu_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_npu_tpu.sampling.sampling_params import SamplingParams

    t = TokenizedGenerateReqInput(
        rid=f"vl-{np.random.randint(1 << 30)}",
        input_text=None,
        input_ids=ids,
        sampling_params=SamplingParams.from_dict(
            {"max_new_tokens": n, "temperature": 0.0, "ignore_eos": True}
        ),
        mm_inputs=mm,
    )
    state = e.tokenizer_manager.submit(t)
    while True:
        chunk, finished = state.mailbox.get(timeout=300)
        if finished:
            return chunk["output_ids"]


def test_mrope_positions_match_hf(vl_setup):
    hf, _, cfg = vl_setup
    pix, grid = make_pixels(cfg)
    ids = build_ids(cfg, grid)
    from sglang_npu_tpu.multimodal.processor import mrope_positions

    hf_dict = cfg.to_dict()
    merged = dict(hf_dict)
    for k, v in hf_dict["text_config"].items():
        if merged.get(k) is None:
            merged[k] = v
    pos, delta = mrope_positions(ids, grid, merged)
    ref_pos, ref_delta = hf.model.get_rope_index(
        torch.tensor([ids]), torch.tensor(grid), None, None, None
    )
    assert np.array_equal(pos, ref_pos[:, 0].numpy()), (pos, ref_pos)
    assert delta == int(ref_delta[0, 0])


def test_vl_greedy_parity(vl_setup):
    hf, e, cfg = vl_setup
    pix, grid = make_pixels(cfg)
    ids = build_ids(cfg, grid)
    got = engine_generate(e, cfg, ids, pix, grid, 8)
    ref = hf_greedy(hf, ids, pix, grid, 8)
    assert got == ref, (got, ref)


def test_vl_two_images(vl_setup):
    hf, e, cfg = vl_setup
    pix1, g1 = make_pixels(cfg, seed=3)
    pix2, g2 = make_pixels(cfg, w=56, h=28, seed=4)
    grid = np.concatenate([g1, g2])
    pix = np.concatenate([pix1, pix2])
    merge = cfg.vision_config.spatial_merge_size
    rng = np.random.default_rng(5)
    ids = rng.integers(3, 290, size=3).tolist()
    for g in grid:
        n_img = int(g[0] * g[1] // merge * g[2] // merge)
        ids += [cfg.vision_start_token_id] + [cfg.image_token_id] * n_img + [
            cfg.vision_end_token_id
        ]
    ids += rng.integers(3, 290, size=3).tolist()
    got = engine_generate(e, cfg, ids, pix, grid, 6)
    ref = hf_greedy(hf, ids, pix, grid, 6)
    assert got == ref, (got, ref)


def test_vl_image_prefix_cache(vl_setup):
    """Same image + same prompt twice: second request must prefix-hit;
    different image with same text layout must NOT reuse KV."""
    hf, e, cfg = vl_setup
    e.flush_cache()
    pix, grid = make_pixels(cfg, seed=7)
    ids = build_ids(cfg, grid, seed=8)
    out1 = engine_generate(e, cfg, ids, pix, grid, 6)
    out2 = engine_generate(e, cfg, ids, pix, grid, 6)
    assert out1 == out2
    st = e.get_internal_state()
    assert st["cache_hit_rate"] > 0
    pixB, _ = make_pixels(cfg, seed=9)
    outB = engine_generate(e, cfg, ids, pixB, grid, 6)
    refB = hf_greedy(hf, ids, pixB, grid, 6)
    assert outB == refB, (outB, refB)


def test_vl_embed_cache_skips_vit(vl_setup):
    """Content-hash embedding cache (reference multimodal_cache.py):
    repeated image content must not re-run the vision tower, even across
    different requests and prompts; different pixels miss the cache."""
    hf, e, cfg = vl_setup
    e.flush_cache()
    runner = e.model_runner
    if hasattr(runner, "_mm_embed_cache"):
        runner._mm_embed_cache.clear()
    runner.mm_embed_cache_hits = 0
    calls = {"n": 0}
    orig = runner.model.compute_vision_embeds

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    runner.model.compute_vision_embeds = counting
    try:
        pix, grid = make_pixels(cfg, seed=21)
        ids1 = build_ids(cfg, grid, seed=22)
        ids2 = build_ids(cfg, grid, seed=23)  # different text, same image
        out1 = engine_generate(e, cfg, ids1, pix, grid, 4)
        out2 = engine_generate(e, cfg, ids2, pix, grid, 4)
        assert calls["n"] == 1, calls  # second request hit the cache
        assert runner.mm_embed_cache_hits >= 1
        # correctness unchanged on the cache-hit path
        assert out2 == hf_greedy(hf, ids2, pix, grid, 4)
        # different image -> miss
        pixB, gridB = make_pixels(cfg, seed=24)
        engine_generate(e, cfg, build_ids(cfg, gridB, seed=25), pixB, gridB, 4)
        assert calls["n"] == 2, calls
    finally:
        runner.model.compute_vision_embeds = orig


def make_video_pixels(cfg, t=2, w=28, h=28, seed=11):
    """A tiny video (t temporal patches) preprocessed HF-style."""
    vc = cfg.vision_config
    rng = np.random.default_rng(seed)
    gh, gw = h // vc.patch_size, w // vc.patch_size
    n = t * gh * gw
    pix = rng.standard_normal(
        (n, vc.in_channels * vc.temporal_patch_size * vc.patch_size**2)
    ).astype(np.float32)
    return pix, np.array([[t, gh, gw]], dtype=np.int64)


def build_video_ids(cfg, grid, n_text=5, seed=12):
    rng = np.random.default_rng(seed)
    merge = cfg.vision_config.spatial_merge_size
    n_tok = int(grid[0, 0] * (grid[0, 1] // merge) * (grid[0, 2] // merge))
    pre = rng.integers(3, 290, size=n_text).tolist()
    ids = (
        pre
        + [cfg.vision_start_token_id]
        + [cfg.video_token_id] * n_tok
        + [cfg.vision_end_token_id]
        + rng.integers(3, 290, size=4).tolist()
    )
    return ids


def _merged_cfg(cfg):
    hf_dict = cfg.to_dict()
    merged = dict(hf_dict)
    for k, v in hf_dict["text_config"].items():
        if merged.get(k) is None:
            merged[k] = v
    return merged


def test_video_mrope_matches_hf(vl_setup):
    """Video temporal rope scaling (t_idx = floor(t * spg * tps)) must
    match HF get_rope_index (reference qwen_vl.py video path)."""
    hf, _, cfg = vl_setup
    pix, grid = make_video_pixels(cfg, t=3)
    ids = build_video_ids(cfg, grid)
    from sglang_npu_tpu.multimodal.processor import mrope_positions

    # integer seconds-per-grid: transformers 4.57 casts second_per_grid_t
    # to the (long) range dtype, truncating fractional values — an
    # upstream quirk; our float math matches it on integer values
    spg = [2.0]
    pos, delta = mrope_positions(
        ids, grid, _merged_cfg(cfg), kinds=["video"], second_per_grid=spg
    )
    ref_pos, ref_delta = hf.model.get_rope_index(
        torch.tensor([ids]), None, torch.tensor(grid),
        torch.tensor(spg, dtype=torch.float32), None,
    )
    assert np.array_equal(pos, ref_pos[:, 0].numpy()), (pos, ref_pos)
    assert delta == int(ref_delta[0, 0])


def test_video_greedy_parity(vl_setup):
    """A video request through the engine (frames -> shared ViT with t>1
    grid, temporal mrope) matches HF greedy exactly."""
    hf, e, cfg = vl_setup
    pix, grid = make_video_pixels(cfg, t=2, seed=16)
    ids = build_video_ids(cfg, grid, seed=17)
    from sglang_npu_tpu.multimodal.processor import mrope_positions
    import hashlib

    spg = [1.0]  # integer: see the HF long-cast quirk note above
    merged = _merged_cfg(cfg)
    pos, delta = mrope_positions(
        ids, grid, merged, kinds=["video"], second_per_grid=spg
    )
    # hash keys over the video span + normalize pad id (as process_images
    # does for the text-in path)
    key = list(ids)
    st = ids.index(cfg.video_token_id)
    ln = sum(1 for t in ids if t == cfg.video_token_id)
    digest = hashlib.sha256(pix.tobytes()).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    key[st : st + ln] = [
        int(x) for x in rng.integers(1 << 30, 1 << 31, size=ln)
    ]
    norm_ids = [
        cfg.image_token_id if t == cfg.video_token_id else t for t in ids
    ]
    mm = {
        "input_ids": norm_ids,
        "key_ids": key,
        "pixel_values": pix,
        "image_grid_thw": grid,
        "mrope_positions": pos,
        "mrope_delta": delta,
        "image_token_id": cfg.image_token_id,
    }
    from sglang_npu_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_npu_tpu.sampling.sampling_params import SamplingParams

    t = TokenizedGenerateReqInput(
        rid="video-1",
        input_text=None,
        input_ids=norm_ids,
        sampling_params=SamplingParams.from_dict(
            {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
        ),
        mm_inputs=mm,
    )
    state = e.tokenizer_manager.submit(t)
    while True:
        chunk, finished = state.mailbox.get(timeout=300)
        if finished:
            got = chunk["output_ids"]
            break
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values_videos=torch.tensor(pix),
            video_grid_thw=torch.tensor(grid),
            second_per_grid_ts=torch.tensor(spg, dtype=torch.float32),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=8, do_sample=False, eos_token_id=None,
            pad_token_id=0,
        )
    ref = out[0][len(ids):].tolist()
    assert got == ref, (got, ref)
