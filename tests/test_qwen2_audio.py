"""Qwen2-Audio end-to-end: Whisper-style encoder (GELU convs, learned
positions, pre-LN layers with bias-less k_proj, stride-2 avg pool),
linear projector, placeholder splice — greedy parity vs HF on a tiny
random-weight model (reference `srt/models/qwen2_audio.py`)."""

import hashlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.models.qwen2_audio import audio_out_lengths

AUDIO_TOKEN = 550
MSP = 8  # max_source_positions -> mel length 16, full out length 4


@pytest.fixture(scope="module")
def audio_setup(tmp_path_factory):
    audio = dict(
        num_mel_bins=12, encoder_layers=3, encoder_attention_heads=2,
        encoder_ffn_dim=64, d_model=32, max_source_positions=MSP,
        activation_function="gelu", scale_embedding=False,
    )
    text = dict(
        vocab_size=600, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-6,
        tie_word_embeddings=False, use_sliding_window=False,
        model_type="qwen2",
    )
    cfg = transformers.Qwen2AudioConfig(
        audio_config=audio, text_config=text, audio_token_index=AUDIO_TOKEN,
        eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.Qwen2AudioForConditionalGeneration(cfg).float().eval()
    d = tmp_path_factory.mktemp("qwen2audio")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    yield hf, e, cfg
    e.shutdown()


def make_features(mel_lens, seed=0):
    rng = np.random.default_rng(seed)
    n = len(mel_lens)
    feats = rng.standard_normal((n, 12, 2 * MSP)).astype(np.float32)
    fam = np.zeros((n, 2 * MSP), dtype=np.int64)
    for i, L in enumerate(mel_lens):
        fam[i, :L] = 1
    return feats, fam


def build_ids(out_lens, seed=1):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 400, size=5).tolist()
    for ol in out_lens:
        ids += [AUDIO_TOKEN] * int(ol)
        ids += rng.integers(3, 400, size=3).tolist()
    return ids


def mm_payload(ids, feats, fam):
    key = list(ids)
    a = 0
    i = 0
    while i < len(key):
        if key[i] == AUDIO_TOKEN:
            j = i
            while j < len(key) and key[j] == AUDIO_TOKEN:
                j += 1
            digest = hashlib.sha256(feats[a].tobytes()).digest()
            rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
            pseudo = rng.integers(1 << 30, 1 << 31, size=j - i, dtype=np.int64)
            key[i:j] = [int(x) for x in pseudo]
            a += 1
            i = j
        else:
            i += 1
    return {
        "input_ids": ids,
        "key_ids": key,
        "input_features": feats,
        "feature_attention_mask": fam,
        "image_token_id": AUDIO_TOKEN,
    }


def engine_generate(e, ids, feats, fam, n):
    from sglang_npu_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_npu_tpu.sampling.sampling_params import SamplingParams

    t = TokenizedGenerateReqInput(
        rid=f"q2a-{np.random.randint(1 << 30)}",
        input_text=None,
        input_ids=ids,
        sampling_params=SamplingParams.from_dict(
            {"max_new_tokens": n, "temperature": 0.0, "ignore_eos": True}
        ),
        mm_inputs=mm_payload(ids, feats, fam),
    )
    state = e.tokenizer_manager.submit(t)
    while True:
        chunk, finished = state.mailbox.get(timeout=300)
        if finished:
            return chunk["output_ids"]


def hf_greedy(hf, ids, feats, fam, n):
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids]),
            input_features=torch.tensor(feats),
            feature_attention_mask=torch.tensor(fam),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=n, do_sample=False, eos_token_id=None,
            pad_token_id=0,
        )
    return out[0][len(ids):].tolist()


def test_qwen2_audio_greedy_parity(audio_setup):
    hf, e, cfg = audio_setup
    feats, fam = make_features([2 * MSP], seed=3)
    _, out_lens = audio_out_lengths(fam.sum(-1))
    ids = build_ids(out_lens, seed=4)
    got = engine_generate(e, ids, feats, fam, 8)
    ref = hf_greedy(hf, ids, feats, fam, 8)
    assert got == ref, (got, ref)


def test_qwen2_audio_two_audios_variable_length(audio_setup):
    hf, e, cfg = audio_setup
    feats, fam = make_features([2 * MSP, 10], seed=5)
    _, out_lens = audio_out_lengths(fam.sum(-1))
    assert out_lens[0] != out_lens[1]  # truly variable-length
    ids = build_ids(out_lens, seed=6)
    got = engine_generate(e, ids, feats, fam, 6)
    ref = hf_greedy(hf, ids, feats, fam, 6)
    assert got == ref, (got, ref)
