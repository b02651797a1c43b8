"""InternVL end-to-end: InternViT tower (cls token, learned positions,
layer scale, LayerNorm or RMSNorm blocks, optional qk norm), pixel-shuffle
downsample, LayerNorm+gelu projector, embedding splice — greedy parity vs
HF on tiny random-weight models (reference `srt/models/internvl.py`)."""

import hashlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

IMAGE_TOKEN = 500
IMG = 28  # image_size; grid = 2x2, after 0.5 pixel shuffle -> 1 token


def make_cfg(norm_type="layer_norm", use_qk_norm=False, attention_bias=False):
    vision = transformers.InternVLVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=[IMG, IMG], patch_size=[14, 14],
        norm_type=norm_type, use_qk_norm=use_qk_norm,
        attention_bias=attention_bias, layer_scale_init_value=0.1,
        use_absolute_position_embeddings=True, hidden_act="gelu",
    )
    text = transformers.Qwen2Config(
        vocab_size=512, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-6,
        tie_word_embeddings=False, use_sliding_window=False,
    )
    return transformers.InternVLConfig(
        vision_config=vision, text_config=text, image_token_id=IMAGE_TOKEN,
        downsample_ratio=0.5, projector_hidden_act="gelu",
        vision_feature_layer=-1, vision_feature_select_strategy="default",
        eos_token_id=2,
    )


TOKENS_PER_IMAGE = 1  # (28//14 * 0.5)^2


def mm_payload(ids, pixel_values):
    key = list(ids)
    img = 0
    for i, t in enumerate(key):
        if t == IMAGE_TOKEN:
            digest = hashlib.sha256(pixel_values[img].tobytes()).digest()
            rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
            key[i] = int(rng.integers(1 << 30, 1 << 31))
            img += 1
    return {
        "input_ids": ids,
        "key_ids": key,
        "pixel_values": pixel_values,
        "image_token_id": IMAGE_TOKEN,
    }


def engine_generate(e, ids, pixel_values, n):
    from sglang_npu_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_npu_tpu.sampling.sampling_params import SamplingParams

    t = TokenizedGenerateReqInput(
        rid=f"ivl-{np.random.randint(1 << 30)}",
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


@pytest.mark.parametrize(
    "norm_type,qk,bias",
    [("layer_norm", False, False), ("rms_norm", True, True)],
)
def test_internvl_greedy_parity(tmp_path_factory, norm_type, qk, bias):
    cfg = make_cfg(norm_type, qk, bias)
    torch.manual_seed(0)
    hf = transformers.InternVLForConditionalGeneration(cfg).float().eval()
    d = tmp_path_factory.mktemp(f"internvl_{norm_type}")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    try:
        rng = np.random.default_rng(7)
        pix = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)
        ids = rng.integers(3, 400, size=4).tolist() + [IMAGE_TOKEN]
        ids += rng.integers(3, 400, size=3).tolist() + [IMAGE_TOKEN]
        ids += rng.integers(3, 400, size=2).tolist()
        got = engine_generate(e, ids, pix, 8)
        ref = hf_greedy(hf, ids, pix, 8)
        assert got == ref, (norm_type, got, ref)
    finally:
        e.shutdown()
