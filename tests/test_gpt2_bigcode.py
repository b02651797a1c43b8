"""GPT-2 / GPTBigCode parity vs HF (learned positions, fused qkv, MQA)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def _drive(d, hf, prompts):
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        for p in prompts:
            out = e.generate(
                input_ids=[p],
                sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                                 "ignore_eos": True},
            )
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([p]), max_new_tokens=6, do_sample=False
                )[0][len(p):].tolist()
            got = out[0]["output_ids"][: len(ref)]
            assert got == ref, (len(p), got, ref)
    finally:
        e.shutdown()


def _prompts():
    rng = np.random.default_rng(2)
    return [rng.integers(3, VOCAB, size=n).tolist() for n in (5, 17)]


def test_gpt2_matches_hf(tmp_path_factory):
    cfg = transformers.GPT2Config(
        vocab_size=VOCAB, n_embd=64, n_layer=3, n_head=4, n_positions=256,
        torch_dtype="float32", eos_token_id=2, bos_token_id=1,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("gpt2")
    hf.save_pretrained(d, safe_serialization=True)
    _drive(d, hf, _prompts())


def test_gpt_bigcode_matches_hf(tmp_path_factory):
    cfg = transformers.GPTBigCodeConfig(
        vocab_size=VOCAB, n_embd=64, n_layer=3, n_head=4, n_positions=256,
        multi_query=True, torch_dtype="float32",
        eos_token_id=2, bos_token_id=1,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.GPTBigCodeForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("bigcode")
    hf.save_pretrained(d, safe_serialization=True)
    # MQA: engine sees num_key_value_heads == 1
    _drive(d, hf, _prompts())
