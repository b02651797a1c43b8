"""Llama-4 vision ("mllama4") greedy parity vs HF: unfold patch embed,
CLS-last + learned positions, 2-D vision rope, pixel-shuffle adapter,
projector, image-token embedding splice over the Llama-4 text trunk
(reference `srt/models/mllama4.py`; HF `Llama4ForConditionalGeneration`)."""

import hashlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 512
IMAGE_TOKEN = 500
IMG, PATCH = 14, 7  # grid 2x2 -> 4 patches; ratio 0.5 -> 1 token/image


def make_cfg():
    vision = transformers.Llama4VisionConfig(
        hidden_size=32, intermediate_size=128,  # = hidden / ratio^2 (MLP2)
        num_hidden_layers=2, num_attention_heads=2,
        image_size=IMG, patch_size=PATCH, pixel_shuffle_ratio=0.5,
        projector_input_dim=24, projector_output_dim=24,
        vision_output_dim=24, rope_theta=10000,
    )
    text = transformers.Llama4TextConfig(
        vocab_size=VOCAB, hidden_size=48, intermediate_size=64,
        intermediate_size_mlp=96, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=2,
        interleave_moe_layer_step=2,
        max_position_embeddings=256, torch_dtype="float32",
        eos_token_id=2, pad_token_id=0, bos_token_id=1,
        use_qk_norm=True, attn_temperature_tuning=True,
        floor_scale=8.0, attn_scale=0.1,
    )
    return transformers.Llama4Config(
        vision_config=vision, text_config=text,
        image_token_index=IMAGE_TOKEN, eos_token_id=2,
    )


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
        rid=f"l4mm-{np.random.randint(1 << 30)}",
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


def test_llama4_mm_greedy_parity(tmp_path_factory):
    cfg = make_cfg()
    torch.manual_seed(0)
    hf = transformers.Llama4ForConditionalGeneration(cfg).float().eval()
    d = tmp_path_factory.mktemp("llama4_mm")
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
        assert got == ref, (got, ref)

        # text-only request through the same engine
        p = rng.integers(3, 400, size=6).tolist()
        out = e.generate(
            input_ids=[p],
            sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            ref2 = hf.generate(
                torch.tensor([p]), max_new_tokens=6, do_sample=False,
                pad_token_id=0, eos_token_id=None,
            )[0][len(p):].tolist()
        assert out[0]["output_ids"][: len(ref2)] == ref2
    finally:
        e.shutdown()
