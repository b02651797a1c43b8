"""OLMo-v1 / Arcee / StableLM parity vs HF."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def _parity(d, hf, seed):
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        rng = np.random.default_rng(seed)
        for n in (5, 17):
            p = rng.integers(3, VOCAB, size=n).tolist()
            out = e.generate(
                input_ids=[p],
                sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                                 "ignore_eos": True},
            )
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([p]), max_new_tokens=6, do_sample=False
                )[0][n:].tolist()
            got = out[0]["output_ids"][: len(ref)]
            assert got == ref, (n, got, ref)
    finally:
        e.shutdown()


def test_olmo_matches_hf(tmp_path_factory):
    cfg = transformers.OlmoConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        clip_qkv=5.0, max_position_embeddings=256, torch_dtype="float32",
        eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = transformers.OlmoForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("olmo")
    hf.save_pretrained(d, safe_serialization=True)
    _parity(d, hf, 8)


def test_arcee_matches_hf(tmp_path_factory):
    cfg = transformers.ArceeConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32",
        eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = transformers.ArceeForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("arcee")
    hf.save_pretrained(d, safe_serialization=True)
    _parity(d, hf, 9)


@pytest.mark.parametrize("parallel,qk_ln", [(False, True), (True, False)])
def test_stablelm_matches_hf(tmp_path_factory, parallel, qk_ln):
    cfg = transformers.StableLmConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.25, use_qkv_bias=True,
        qk_layernorm=qk_ln, use_parallel_residual=parallel,
        max_position_embeddings=256, torch_dtype="float32",
        eos_token_id=2, pad_token_id=0,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    # HF's _init_weights crashes on the bias-less per-head LayerNorms;
    # skip it and randomize manually
    from transformers.modeling_utils import no_init_weights

    with no_init_weights():
        hf = transformers.StableLmForCausalLM(cfg)
    for prm in hf.parameters():
        prm.data.uniform_(-0.08, 0.08)
    hf.eval()
    d = tmp_path_factory.mktemp(f"stablelm_{parallel}_{qk_ln}")
    hf.save_pretrained(d, safe_serialization=True)
    _parity(d, hf, 10)
