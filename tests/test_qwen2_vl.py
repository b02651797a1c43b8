"""Qwen2-VL end-to-end: full-attention LayerNorm ViT, quick-gelu MLP,
2D rope, merger, mrope LM — greedy parity vs HF on a tiny random-weight
model (reference `srt/models/qwen2_vl.py`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 600


@pytest.fixture(scope="module")
def vl_setup(tmp_path_factory):
    vision = dict(
        depth=3,
        embed_dim=64,
        hidden_size=48,  # LM-facing output dim in qwen2-vl
        num_heads=4,
        mlp_ratio=2,
        patch_size=14,
        temporal_patch_size=2,
        spatial_merge_size=2,
        in_channels=3,
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
    cfg = transformers.Qwen2VLConfig(
        text_config=text,
        vision_config=vision,
        image_token_id=595,
        vision_start_token_id=593,
        vision_end_token_id=594,
        eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.Qwen2VLForConditionalGeneration(cfg)
    hf = hf.float().eval()
    d = tmp_path_factory.mktemp("qwen2vl")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    yield hf, e, cfg
    e.shutdown()


def make_pixels(cfg, w=28, h=28, seed=0):
    vc = cfg.vision_config
    rng = np.random.default_rng(seed)
    gh, gw = h // vc.patch_size, w // vc.patch_size
    n = gh * gw
    pix = rng.standard_normal(
        (n, vc.in_channels * vc.temporal_patch_size * vc.patch_size**2)
    ).astype(np.float32)
    return pix, np.array([[1, gh, gw]], dtype=np.int64)


def build_ids(cfg, grid, n_text=6, seed=1):
    rng = np.random.default_rng(seed)
    merge = cfg.vision_config.spatial_merge_size
    ids = rng.integers(3, 290, size=n_text).tolist()
    for g in np.asarray(grid):
        n_img = int(g[0] * g[1] // merge * g[2] // merge)
        ids += [cfg.vision_start_token_id] + [cfg.image_token_id] * n_img + [
            cfg.vision_end_token_id
        ]
    ids += rng.integers(3, 290, size=4).tolist()
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
    from sglang_npu_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_npu_tpu.multimodal.processor import hash_key_ids, mrope_positions
    from sglang_npu_tpu.sampling.sampling_params import SamplingParams

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
    t = TokenizedGenerateReqInput(
        rid=f"q2vl-{np.random.randint(1 << 30)}",
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


def test_qwen2vl_greedy_parity(vl_setup):
    hf, e, cfg = vl_setup
    pix, grid = make_pixels(cfg)
    ids = build_ids(cfg, grid)
    got = engine_generate(e, cfg, ids, pix, grid, 8)
    ref = hf_greedy(hf, ids, pix, grid, 8)
    assert got == ref, (got, ref)


def test_qwen2vl_two_images(vl_setup):
    hf, e, cfg = vl_setup
    pix1, g1 = make_pixels(cfg, seed=3)
    pix2, g2 = make_pixels(cfg, w=56, h=28, seed=4)
    grid = np.concatenate([g1, g2])
    pix = np.concatenate([pix1, pix2])
    ids = build_ids(cfg, grid, n_text=3, seed=5)
    got = engine_generate(e, cfg, ids, pix, grid, 6)
    ref = hf_greedy(hf, ids, pix, grid, 6)
    assert got == ref, (got, ref)
