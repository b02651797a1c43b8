"""Logprob output parity with HF (reference: logprob assembly in
`tokenizer_manager.py:1596-1721`, sampler logprob extraction)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        tie_word_embeddings=False,
        torch_dtype="float32",
        eos_token_id=2,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    d = tmp_path_factory.mktemp("lp_model")
    model.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d),
        dtype="float32",
        skip_tokenizer_init=True,
        page_size=4,
        max_total_tokens=4096,
        attention_backend="xla",
        random_seed=0,
    )
    e._hf = model
    yield e
    e.shutdown()


def test_output_logprobs_match_hf(engine):
    prompt = [5, 9, 11, 33, 7]
    out = engine.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True},
        return_logprob=True,
        top_logprobs_num=3,
    )
    lps = out["meta_info"]["output_token_logprobs"]
    tops = out["meta_info"]["output_top_logprobs"]
    assert len(lps) == 6
    assert len(tops) == 6
    assert all(len(t) == 3 for t in tops)

    # HF reference: stepwise greedy logprobs
    hf = engine._hf
    ids = list(prompt)
    for lp, tok, _txt in lps:
        with torch.no_grad():
            logits = hf(torch.tensor([ids])).logits[0, -1]
        ref_lp = torch.log_softmax(logits.float(), -1)
        ref_tok = int(torch.argmax(logits))
        assert tok == ref_tok
        np.testing.assert_allclose(lp, float(ref_lp[ref_tok]), rtol=1e-3, atol=1e-3)
        ids.append(tok)

    # top-1 of top_logprobs == chosen token for greedy
    for (lp, tok, _), top in zip(lps, tops):
        assert top[0][1] == tok
        assert abs(top[0][0] - lp) < 1e-4


def test_input_logprobs_match_hf(engine):
    prompt = [5, 9, 11, 33, 7, 21, 14]
    out = engine.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 2, "temperature": 0.0, "ignore_eos": True},
        return_logprob=True,
    )
    # default logprob_start_len=-1 -> no input logprobs
    assert "input_token_logprobs" not in out["meta_info"]

    out = engine.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 2, "temperature": 0.0, "ignore_eos": True},
        return_logprob=True,
        logprob_start_len=0,
    )
    inp = out["meta_info"]["input_token_logprobs"]
    # entries for positions 1..len-1 (first token has no context)
    assert len(inp) == len(prompt) - 1
    hf = engine._hf if hasattr(engine, "_hf") else None
    with torch.no_grad():
        logits = engine._hf(torch.tensor([prompt])).logits[0]
    ref_lp = torch.log_softmax(logits.float(), -1)
    for j, (lp, tok, _) in enumerate(inp):
        pos = j  # predicts token at pos+1
        assert tok == prompt[pos + 1]
        np.testing.assert_allclose(
            lp, float(ref_lp[pos, tok]), rtol=2e-3, atol=2e-3
        )
