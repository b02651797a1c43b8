"""Pixtral-LLaVA end-to-end: variable-size images, RMSNorm blocks, 2D
rope, block-diagonal attention, gelu projector — greedy parity vs HF on
a tiny random-weight model (reference `srt/models/pixtral.py`)."""

import hashlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

IMAGE_TOKEN = 500
PATCH = 14
IMG = 56  # max side -> 4x4 patch grid


@pytest.fixture(scope="module")
def pixtral_setup(tmp_path_factory):
    vision = transformers.PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=IMG, patch_size=PATCH,
        rope_theta=10000.0, hidden_act="silu",
    )
    text = transformers.MistralConfig(
        vocab_size=512, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-6,
        tie_word_embeddings=False, sliding_window=None,
    )
    cfg = transformers.LlavaConfig(
        vision_config=vision, text_config=text, image_token_index=IMAGE_TOKEN,
        vision_feature_layer=-1, vision_feature_select_strategy="full",
        projector_hidden_act="gelu", eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.LlavaForConditionalGeneration(cfg).float().eval()
    d = tmp_path_factory.mktemp("pixtral")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    yield hf, e, cfg
    e.shutdown()


def make_images(sizes, seed=0):
    """Variable-size images padded into one [N, 3, maxH, maxW] array."""
    rng = np.random.default_rng(seed)
    mh = max(h for h, w in sizes)
    mw = max(w for h, w in sizes)
    pix = np.zeros((len(sizes), 3, mh, mw), np.float32)
    for i, (h, w) in enumerate(sizes):
        pix[i, :, :h, :w] = rng.standard_normal((3, h, w))
    return pix, np.asarray(sizes, dtype=np.int64)


def build_ids(sizes, seed=1):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 400, size=5).tolist()
    for h, w in sizes:
        n = (h // PATCH) * (w // PATCH)
        ids += [IMAGE_TOKEN] * n + rng.integers(3, 400, size=2).tolist()
    return ids


def mm_payload(ids, pix, sizes):
    key = list(ids)
    img = 0
    i = 0
    while i < len(key):
        if key[i] == IMAGE_TOKEN:
            h, w = sizes[img]
            span = (int(h) // PATCH) * (int(w) // PATCH)
            digest = hashlib.sha256(pix[img].tobytes()).digest()
            rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
            pseudo = rng.integers(1 << 30, 1 << 31, size=span, dtype=np.int64)
            key[i : i + span] = [int(x) for x in pseudo]
            i += span
            img += 1
        else:
            i += 1
    return {
        "input_ids": ids,
        "key_ids": key,
        "pixel_values": pix,
        "image_sizes": sizes,
        "image_token_id": IMAGE_TOKEN,
    }


def engine_generate(e, ids, pix, sizes, n):
    from sglang_npu_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_npu_tpu.sampling.sampling_params import SamplingParams

    t = TokenizedGenerateReqInput(
        rid=f"px-{np.random.randint(1 << 30)}",
        input_text=None,
        input_ids=ids,
        sampling_params=SamplingParams.from_dict(
            {"max_new_tokens": n, "temperature": 0.0, "ignore_eos": True}
        ),
        mm_inputs=mm_payload(ids, pix, sizes),
    )
    state = e.tokenizer_manager.submit(t)
    while True:
        chunk, finished = state.mailbox.get(timeout=300)
        if finished:
            return chunk["output_ids"]


def hf_greedy(hf, ids, pix, sizes, n):
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pix),
            image_sizes=torch.tensor(sizes),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=n, do_sample=False, eos_token_id=None,
            pad_token_id=0,
        )
    return out[0][len(ids):].tolist()


def test_pixtral_greedy_parity(pixtral_setup):
    hf, e, cfg = pixtral_setup
    sizes = [(28, 28)]
    pix, sz = make_images(sizes, seed=2)
    ids = build_ids(sizes, seed=3)
    got = engine_generate(e, ids, pix, sz, 8)
    ref = hf_greedy(hf, ids, pix, sz, 8)
    assert got == ref, (got, ref)


def test_pixtral_variable_sizes(pixtral_setup):
    hf, e, cfg = pixtral_setup
    sizes = [(28, 56), (56, 28)]
    pix, sz = make_images(sizes, seed=4)
    ids = build_ids(sizes, seed=5)
    got = engine_generate(e, ids, pix, sz, 6)
    ref = hf_greedy(hf, ids, pix, sz, 6)
    assert got == ref, (got, ref)
