"""Gemma-3 HF-diff numerics: 5:1 sliding pattern, per-layer rope
(local/global), q/k rms-norm, no softcaps (reference
`srt/models/gemma3_causal.py`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


@pytest.fixture(scope="module")
def gemma3_setup(tmp_path_factory):
    cfg = transformers.Gemma3TextConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=6,  # 5 sliding + 1 full with pattern 6
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        sliding_window=8,
        sliding_window_pattern=6,
        rope_theta=1_000_000.0,
        rope_local_base_freq=10_000.0,
        query_pre_attn_scalar=16,
        torch_dtype="float32",
        eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.Gemma3ForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("gemma3")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    yield hf, e
    e.shutdown()


def hf_greedy(hf, prompt, n):
    with torch.no_grad():
        # eos disabled to mirror ignore_eos=True on the engine side
        return hf.generate(
            torch.tensor([prompt]), max_new_tokens=n, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0][len(prompt):].tolist()


def test_gemma3_hybrid_pool(gemma3_setup):
    _, e = gemma3_setup
    from sglang_npu_tpu.ops.hybrid_kv import HybridKVPool

    pool = e.scheduler.runner.kv_pool
    assert isinstance(pool, HybridKVPool)
    assert pool.swa.shape[0] == 5 and pool.full.shape[0] == 1


def test_gemma3_matches_hf(gemma3_setup):
    hf, e = gemma3_setup
    rng = np.random.default_rng(0)
    for n in (5, 40):
        prompt = rng.integers(3, VOCAB, size=n).tolist()
        out = e.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 12, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert out["output_ids"] == hf_greedy(hf, prompt, 12), n


def test_gemma3_long_decode(gemma3_setup):
    """Decode far past the window so the ring wraps repeatedly."""
    hf, e = gemma3_setup
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, VOCAB, size=7).tolist()
    out = e.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 48, "temperature": 0.0,
                         "ignore_eos": True},
    )
    assert out["output_ids"] == hf_greedy(hf, prompt, 48)
