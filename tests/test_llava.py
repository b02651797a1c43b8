"""LLaVA end-to-end: CLIP ViT tower (class token, learned positions,
quick-gelu pre-LN blocks, feature-layer select), gelu projector, embedding
splice — greedy parity vs HF on a tiny random-weight model (reference
`srt/models/llava.py`, `multimodal/processors/llava.py`)."""

import hashlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

IMAGE_TOKEN = 500


@pytest.fixture(scope="module")
def llava_setup(tmp_path_factory):
    vision = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
    )
    text = transformers.LlamaConfig(
        vocab_size=512, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-6,
        tie_word_embeddings=False,
    )
    cfg = transformers.LlavaConfig(
        vision_config=vision, text_config=text, image_token_index=IMAGE_TOKEN,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
        projector_hidden_act="gelu", eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.LlavaForConditionalGeneration(cfg).float().eval()
    d = tmp_path_factory.mktemp("llava")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    yield hf, e, cfg
    e.shutdown()


def make_pixels(n=1, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 3, 28, 28)).astype(np.float32)


TOKENS_PER_IMAGE = (28 // 14) ** 2  # 4


def build_ids(n_images=1, seed=1):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 400, size=5).tolist()
    for _ in range(n_images):
        ids += [IMAGE_TOKEN] * TOKENS_PER_IMAGE
        ids += rng.integers(3, 400, size=3).tolist()
    return ids


def mm_payload(ids, pixel_values):
    key = list(ids)
    i = 0
    img = 0
    while i < len(key):
        if key[i] == IMAGE_TOKEN:
            digest = hashlib.sha256(pixel_values[img].tobytes()).digest()
            rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
            span = TOKENS_PER_IMAGE
            pseudo = rng.integers(1 << 30, 1 << 31, size=span, dtype=np.int64)
            key[i : i + span] = [int(x) for x in pseudo]
            i += span
            img += 1
        else:
            i += 1
    return {
        "input_ids": ids,
        "key_ids": key,
        "pixel_values": pixel_values,
        "image_token_id": IMAGE_TOKEN,
    }


def hf_greedy(hf, ids, pixel_values, n):
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pixel_values),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=n, do_sample=False, eos_token_id=None,
            pad_token_id=0,
        )
    return out[0][len(ids):].tolist()


def engine_generate(e, ids, pixel_values, n):
    from sglang_npu_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_npu_tpu.sampling.sampling_params import SamplingParams

    t = TokenizedGenerateReqInput(
        rid=f"llava-{np.random.randint(1 << 30)}",
        input_text=None,
        input_ids=ids,
        sampling_params=SamplingParams.from_dict(
            {"max_new_tokens": n, "temperature": 0.0, "ignore_eos": True}
        ),
        mm_inputs=mm_payload(ids, pixel_values),
    )
    state = e.tokenizer_manager.submit(t)
    while True:
        chunk, finished = state.mailbox.get(timeout=300)
        if finished:
            return chunk["output_ids"]


def test_llava_greedy_parity(llava_setup):
    hf, e, _cfg = llava_setup
    pix = make_pixels(seed=2)
    ids = build_ids(seed=3)
    got = engine_generate(e, ids, pix, 8)
    ref = hf_greedy(hf, ids, pix, 8)
    assert got == ref, (got, ref)


def test_llava_two_images(llava_setup):
    hf, e, _cfg = llava_setup
    pix = make_pixels(n=2, seed=4)
    ids = build_ids(n_images=2, seed=5)
    got = engine_generate(e, ids, pix, 6)
    ref = hf_greedy(hf, ids, pix, 6)
    assert got == ref, (got, ref)


def test_llava_image_prefix_cache(llava_setup):
    hf, e, _cfg = llava_setup
    e.flush_cache()
    pix = make_pixels(seed=7)
    ids = build_ids(seed=8)
    out1 = engine_generate(e, ids, pix, 6)
    out2 = engine_generate(e, ids, pix, 6)
    assert out1 == out2
    assert e.get_internal_state()["cache_hit_rate"] > 0
    pixB = make_pixels(seed=9)
    outB = engine_generate(e, ids, pixB, 6)
    refB = hf_greedy(hf, ids, pixB, 6)
    assert outB == refB, (outB, refB)


def test_fixed_grid_processor_expansion():
    """_process_fixed_grid expands one placeholder per image and hashes
    radix keys per image content."""
    from sglang_npu_tpu.multimodal.processor import _process_fixed_grid

    class FakeIP:
        def __call__(self, images, return_tensors):
            return {"pixel_values": np.stack([np.asarray(im) for im in images])}

    hf_cfg = {
        "model_type": "llava",
        "image_token_index": IMAGE_TOKEN,
        "vision_config": {"image_size": 28, "patch_size": 14},
    }
    imgs = [np.ones((3, 28, 28), np.float32), np.zeros((3, 28, 28), np.float32)]
    ids = [7, IMAGE_TOKEN, 8, IMAGE_TOKEN, 9]
    out = _process_fixed_grid(FakeIP(), None, ids, imgs, hf_cfg)
    want_len = 3 + 2 * TOKENS_PER_IMAGE
    assert len(out["input_ids"]) == want_len
    assert out["input_ids"].count(IMAGE_TOKEN) == 2 * TOKENS_PER_IMAGE
    key = out["key_ids"]
    assert len(key) == want_len
    assert IMAGE_TOKEN not in key
    # different images -> different pseudo ids
    assert key[1 : 1 + TOKENS_PER_IMAGE] != key[
        2 + TOKENS_PER_IMAGE : 2 + 2 * TOKENS_PER_IMAGE
    ]
