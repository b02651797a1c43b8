"""Mllama (Llama-3.2-Vision) — tiled ViT + cross-attention trunk, greedy
parity vs HF on a tiny random-weight model (reference
`srt/models/mllama.py:1`).  Covers: image request, text-only request
through the same engine (cross layers must be an exact identity), mixed
batch, and text tokens BEFORE the image (the full-row mask quirk)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 300
IMG_TOK = 295


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    vision = dict(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_global_layers=2,
        attention_heads=2,
        patch_size=14,
        image_size=28,  # 2x2 = 4 patches + cls = 5 per tile
        max_num_tiles=2,
        supported_aspect_ratios=[[1, 1], [1, 2], [2, 1]],
        intermediate_layers_indices=[1, 2],
        vision_output_dim=96,  # 32 * (1 final + 2 intermediates)
        num_channels=3,
    )
    text = dict(
        vocab_size=VOCAB,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        cross_attention_layers=[1, 3],
        max_position_embeddings=512,
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 256,
        },
        tie_word_embeddings=False,
        eos_token_id=2,
        pad_token_id=0,
    )
    cfg = transformers.MllamaConfig(
        vision_config=vision, text_config=text, image_token_index=IMG_TOK,
    )
    torch.manual_seed(0)
    hf = transformers.MllamaForConditionalGeneration(cfg)
    hf = hf.float().eval()
    d = tmp_path_factory.mktemp("mllama")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    yield hf, e, cfg
    e.shutdown()


def make_image_inputs(cfg, tiles=1, seed=0):
    """HF-preprocessed tiles: pixel_values [1, 1, max_tiles, 3, H, W],
    aspect ids/masks (aspect [1,1] -> id 1, one real tile)."""
    vc = cfg.vision_config
    rng = np.random.default_rng(seed)
    pix = np.zeros(
        (1, 1, vc.max_num_tiles, 3, vc.image_size, vc.image_size), np.float32
    )
    pix[0, 0, :tiles] = rng.standard_normal(
        (tiles, 3, vc.image_size, vc.image_size)
    )
    aspect_id = 1 if tiles == 1 else 2  # [1,1] -> 1; [1,2] -> 2
    ids = np.array([[aspect_id]], np.int64)
    mask = np.zeros((1, 1, vc.max_num_tiles), np.int64)
    mask[0, 0, :tiles] = 1
    return pix, ids, mask


def build_cross_mask(ids, tiles, max_tiles):
    """HF cross_attention_mask [1, T, 1, max_tiles]: tokens at/after the
    image token attend its real tiles."""
    T = len(ids)
    first = ids.index(IMG_TOK)
    m = np.zeros((1, T, 1, max_tiles), np.int64)
    m[0, first:, 0, :tiles] = 1
    return m


def hf_greedy(hf, ids, pix, aids, amask, n, tiles):
    cm = torch.tensor(build_cross_mask(list(ids), tiles, amask.shape[-1]))
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pix),
            aspect_ratio_ids=torch.tensor(aids),
            aspect_ratio_mask=torch.tensor(amask),
            cross_attention_mask=cm,
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=n, do_sample=False, eos_token_id=None,
            pad_token_id=0,
        )
    return out[0][len(ids):].tolist()


def engine_generate(e, ids, mm, n):
    from sglang_npu_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_npu_tpu.sampling.sampling_params import SamplingParams

    t = TokenizedGenerateReqInput(
        rid=f"mllama-{np.random.randint(1 << 30)}",
        input_text=None,
        input_ids=list(ids),
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


def mk_mm(ids, pix, aids, amask):
    key = list(ids)
    first = ids.index(IMG_TOK)
    key[first] = (1 << 30) + int(abs(pix.sum() * 1000)) % (1 << 20)
    return {
        "input_ids": list(ids),
        "key_ids": key,
        "pixel_values": pix,
        "aspect_ratio_ids": aids,
        "aspect_ratio_mask": amask,
        "image_token_id": IMG_TOK,
    }


def test_mllama_image_greedy_parity(setup):
    hf, e, cfg = setup
    pix, aids, amask = make_image_inputs(cfg, tiles=1, seed=1)
    rng = np.random.default_rng(2)
    ids = [IMG_TOK] + rng.integers(3, 290, size=7).tolist()
    got = engine_generate(e, ids, mk_mm(ids, pix, aids, amask), 8)
    ref = hf_greedy(hf, ids, pix, aids, amask, 8, tiles=1)
    assert got == ref, (got, ref)


def test_mllama_two_tiles(setup):
    hf, e, cfg = setup
    pix, aids, amask = make_image_inputs(cfg, tiles=2, seed=3)
    rng = np.random.default_rng(4)
    ids = [IMG_TOK] + rng.integers(3, 290, size=5).tolist()
    got = engine_generate(e, ids, mk_mm(ids, pix, aids, amask), 6)
    ref = hf_greedy(hf, ids, pix, aids, amask, 6, tiles=2)
    assert got == ref, (got, ref)


def test_mllama_text_before_image_quirk(setup):
    """Tokens before the image: HF zeroes their cross-MLP delta but lets
    them attend uniformly (the full-row mask quirk) — must match."""
    hf, e, cfg = setup
    pix, aids, amask = make_image_inputs(cfg, tiles=1, seed=5)
    rng = np.random.default_rng(6)
    ids = rng.integers(3, 290, size=4).tolist() + [IMG_TOK] + rng.integers(
        3, 290, size=4
    ).tolist()
    got = engine_generate(e, ids, mk_mm(ids, pix, aids, amask), 6)
    ref = hf_greedy(hf, ids, pix, aids, amask, 6, tiles=1)
    assert got == ref, (got, ref)


def test_mllama_text_only_matches_hf(setup):
    """Text-only through the same engine: cross layers must be an exact
    identity (zero K/V slot), matching HF skipping them."""
    hf, e, cfg = setup
    rng = np.random.default_rng(7)
    ids = rng.integers(3, 290, size=9).tolist()
    got = engine_generate(e, ids, None, 6)
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=6, do_sample=False, eos_token_id=None,
            pad_token_id=0,
        )
    ref = out[0][len(ids):].tolist()
    assert got == ref, (got, ref)


def test_mllama_mixed_batch(setup):
    """Image and text-only requests batched TOGETHER: the text rows ride
    slot 0 (zero cross K/V -> identity) while the image row cross-attends;
    both must match their HF references."""
    hf, e, cfg = setup
    pix, aids, amask = make_image_inputs(cfg, tiles=1, seed=8)
    rng = np.random.default_rng(9)
    img_ids = [IMG_TOK] + rng.integers(3, 290, size=6).tolist()
    txt_ids = rng.integers(3, 290, size=8).tolist()

    import threading

    results = {}

    def run(name, ids, mm):
        results[name] = engine_generate(e, ids, mm, 6)

    threads = [
        threading.Thread(
            target=run, args=("img", img_ids, mk_mm(img_ids, pix, aids, amask))
        ),
        threading.Thread(target=run, args=("txt", txt_ids, None)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    ref_img = hf_greedy(hf, img_ids, pix, aids, amask, 6, tiles=1)
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([txt_ids]),
            attention_mask=torch.ones(1, len(txt_ids), dtype=torch.long),
            max_new_tokens=6, do_sample=False, eos_token_id=None,
            pad_token_id=0,
        )
    ref_txt = out[0][len(txt_ids):].tolist()
    assert results["img"] == ref_img, (results["img"], ref_img)
    assert results["txt"] == ref_txt, (results["txt"], ref_txt)
