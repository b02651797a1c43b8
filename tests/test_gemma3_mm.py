"""Gemma-3 multimodal: SigLIP tower, avg-pool projector, embedding splice,
and same-image BIDIRECTIONAL attention (fb.mm_groups) — greedy parity vs
HF (with token_type_ids) on a tiny random-weight model (reference
`srt/models/gemma3_mm.py`)."""

import hashlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

IMAGE_TOKEN = 120
MM_TOKENS = 4  # per image (pool_side 2 over a 2x2 patch grid)


@pytest.fixture(scope="module")
def g3mm_setup(tmp_path_factory):
    vision = transformers.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
    )
    text = transformers.Gemma3TextConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, sliding_window=8,
        sliding_window_pattern=6, rope_theta=1_000_000.0,
        rope_local_base_freq=10_000.0, query_pre_attn_scalar=16,
    )
    cfg = transformers.Gemma3Config(
        vision_config=vision, text_config=text,
        image_token_index=IMAGE_TOKEN, mm_tokens_per_image=MM_TOKENS,
        boi_token_index=118, eoi_token_index=119, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.Gemma3ForConditionalGeneration(cfg).float().eval()
    d = tmp_path_factory.mktemp("gemma3mm")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, random_seed=0,
    )
    yield hf, e
    e.shutdown()


def make_pixels(n=1, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 3, 28, 28)).astype(np.float32)


def build_ids(n_images=1, seed=1):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 110, size=5).tolist()
    for _ in range(n_images):
        ids += [118] + [IMAGE_TOKEN] * MM_TOKENS + [119]
        ids += rng.integers(3, 110, size=3).tolist()
    return ids


def mm_payload(ids, pixel_values):
    key = list(ids)
    img = 0
    i = 0
    while i < len(key):
        if key[i] == IMAGE_TOKEN:
            digest = hashlib.sha256(pixel_values[img].tobytes()).digest()
            rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
            pseudo = rng.integers(1 << 30, 1 << 31, size=MM_TOKENS, dtype=np.int64)
            key[i : i + MM_TOKENS] = [int(x) for x in pseudo]
            i += MM_TOKENS
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
    token_type_ids = torch.tensor(
        [[1 if t == IMAGE_TOKEN else 0 for t in ids]]
    )
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pixel_values),
            token_type_ids=token_type_ids,
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=n, do_sample=False, eos_token_id=None,
            pad_token_id=0,
        )
    return out[0][len(ids):].tolist()


def engine_generate(e, ids, pixel_values, n):
    from sglang_npu_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_npu_tpu.sampling.sampling_params import SamplingParams

    t = TokenizedGenerateReqInput(
        rid=f"g3mm-{np.random.randint(1 << 30)}",
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


def test_gemma3_mm_greedy_parity(g3mm_setup):
    hf, e = g3mm_setup
    pix = make_pixels(seed=2)
    ids = build_ids(seed=3)
    got = engine_generate(e, ids, pix, 8)
    ref = hf_greedy(hf, ids, pix, 8)
    assert got == ref, (got, ref)


def test_gemma3_mm_two_images(g3mm_setup):
    hf, e = g3mm_setup
    pix = make_pixels(n=2, seed=4)
    ids = build_ids(n_images=2, seed=5)
    got = engine_generate(e, ids, pix, 6)
    ref = hf_greedy(hf, ids, pix, 6)
    assert got == ref, (got, ref)


def test_gemma3_mm_text_only(g3mm_setup):
    """Text-only requests on the mm model (no group map) stay causal and
    match HF."""
    hf, e = g3mm_setup
    ids = list(np.random.default_rng(9).integers(3, 110, size=8))
    from sglang_npu_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_npu_tpu.sampling.sampling_params import SamplingParams

    t = TokenizedGenerateReqInput(
        rid="g3mm-text", input_text=None, input_ids=[int(x) for x in ids],
        sampling_params=SamplingParams.from_dict(
            {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}
        ),
    )
    state = e.tokenizer_manager.submit(t)
    while True:
        chunk, finished = state.mailbox.get(timeout=300)
        if finished:
            break
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([[int(x) for x in ids]]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=4, do_sample=False, eos_token_id=None,
            pad_token_id=0,
        )
    assert chunk["output_ids"] == out[0][len(ids):].tolist()
