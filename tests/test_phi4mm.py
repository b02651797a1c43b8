"""Phi-4-multimodal greedy parity vs HF: SigLIP-navit tower with
dynamic-HD crop reassembly + separators, conformer audio encoder
(NeMo subsampling, relative attention bias, GLU conv module), speech vs
vision-speech projection switch, mixed image+audio prompts (reference
`srt/models/phi4mm.py`; HF `Phi4MultimodalForCausalLM`)."""

import hashlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 512
IMAGE_TOKEN, AUDIO_TOKEN = 500, 501
IMG, PATCH = 28, 7  # grid 4 -> pooled base 2


def make_cfg():
    from transformers.models.phi4_multimodal import (
        Phi4MultimodalAudioConfig,
        Phi4MultimodalVisionConfig,
    )

    vision = Phi4MultimodalVisionConfig(
        hidden_size=32, intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=2, patch_size=PATCH, image_size=IMG,
        crop_size=IMG, image_token_id=IMAGE_TOKEN, feature_layer=-2,
    )
    audio = Phi4MultimodalAudioConfig(
        hidden_size=16, intermediate_size=24, num_attention_heads=2,
        num_blocks=2, input_size=16, ext_pw_out_channel=16,
        depthwise_separable_out_channel=16, depthwise_multiplier=1,
        kernel_size=3, nemo_conv_channels=8, nemo_final_size=2,
        time_reduction=8, bias_max_distance=16, bias_symmetric=False,
        chunk_size=-1, left_chunk=18, audio_token_id=AUDIO_TOKEN,
    )
    return transformers.Phi4MultimodalConfig(
        vision_config=vision, audio_config=audio,
        vocab_size=VOCAB, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        rms_norm_eps=1e-5, torch_dtype="float32",
        eos_token_id=2, pad_token_id=0, bos_token_id=1,
        tie_word_embeddings=False,
    )


# image of size (28, 56): 1x2 sub-crop grid + global crop; base feat 2
IMG_SIZES = np.asarray([[28, 56]], np.int64)
N_CROPS = 3
# rows: sub 2*(4+1)=10, +1 separator, + global 2*(2+1)=6 -> 17
N_IMG_TOKENS = 17
N_AUD_TOKENS = 4  # 32 mel frames / time_reduction 8


def build_inputs(rng, with_image=True, with_audio=True):
    g = IMG // PATCH
    pix = (
        rng.standard_normal((1, N_CROPS, 3, IMG, IMG)).astype(np.float32)
        if with_image else None
    )
    am = np.ones((1, N_CROPS, g, g), np.float32) if with_image else None
    audio = (
        rng.standard_normal((1, 32, 16)).astype(np.float32)
        if with_audio else None
    )
    ids = rng.integers(3, 400, size=3).tolist()
    if with_image:
        ids += [IMAGE_TOKEN] * N_IMG_TOKENS
    ids += rng.integers(3, 400, size=2).tolist()
    if with_audio:
        ids += [AUDIO_TOKEN] * N_AUD_TOKENS
    ids += rng.integers(3, 400, size=2).tolist()
    return ids, pix, am, audio


def mm_payload(ids, pix, am, audio):
    key = list(ids)
    blob = (pix.tobytes() if pix is not None else b"") + (
        audio.tobytes() if audio is not None else b""
    )
    digest = hashlib.sha256(blob).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    for i, t in enumerate(key):
        if t in (IMAGE_TOKEN, AUDIO_TOKEN):
            key[i] = int(rng.integers(1 << 30, 1 << 31))
    mm = {
        "input_ids": ids,
        "key_ids": key,
        "image_token_id": IMAGE_TOKEN,
        "extra_token_ids": [AUDIO_TOKEN],
    }
    if pix is not None:
        mm.update(
            image_pixel_values=pix, image_sizes=IMG_SIZES,
            image_attention_mask=am,
        )
    if audio is not None:
        mm.update(
            audio_input_features=audio,
            audio_embed_sizes=np.asarray([N_AUD_TOKENS], np.int64),
        )
    return mm


def engine_generate(e, ids, mm, n):
    from sglang_npu_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_npu_tpu.sampling.sampling_params import SamplingParams

    t = TokenizedGenerateReqInput(
        rid=f"p4mm-{np.random.randint(1 << 30)}",
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


def hf_greedy(hf, ids, pix, am, audio, n):
    kw = {}
    if pix is not None:
        kw.update(
            image_pixel_values=torch.tensor(pix),
            image_sizes=torch.tensor(IMG_SIZES),
            image_attention_mask=torch.tensor(am),
        )
    if audio is not None:
        kw.update(
            audio_input_features=torch.tensor(audio),
            audio_embed_sizes=torch.tensor([N_AUD_TOKENS]),
        )
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=n, do_sample=False, eos_token_id=None,
            pad_token_id=0, **kw,
        )
    return out[0][len(ids):].tolist()


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = make_cfg()
    torch.manual_seed(0)
    hf = transformers.Phi4MultimodalForCausalLM(cfg).float().eval()
    # random-init logit gaps are ~0.05 nats — knife-edge against the
    # f32 op-order noise of a deep tower chain; sharpening the head
    # makes greedy argmax robust without changing the compared math
    with torch.no_grad():
        hf.lm_head.weight.mul_(10.0)
    d = tmp_path_factory.mktemp("phi4mm")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    yield hf, e
    e.shutdown()


@pytest.mark.parametrize(
    "with_image,with_audio",
    [(True, False), (False, True), (True, True)],
)
def test_phi4mm_greedy_parity(setup, with_image, with_audio):
    hf, e = setup
    rng = np.random.default_rng(11 + with_image + 2 * with_audio)
    ids, pix, am, audio = build_inputs(rng, with_image, with_audio)
    got = engine_generate(e, ids, mm_payload(ids, pix, am, audio), 8)
    ref = hf_greedy(hf, ids, pix, am, audio, 8)
    assert got == ref, (with_image, with_audio, got, ref)


def test_phi4mm_text_only(setup):
    hf, e = setup
    rng = np.random.default_rng(5)
    p = rng.integers(3, 400, size=7).tolist()
    out = e.generate(
        input_ids=[p],
        sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                         "ignore_eos": True},
    )
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([p]), max_new_tokens=6, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        )[0][len(p):].tolist()
    assert out[0]["output_ids"][: len(ref)] == ref
