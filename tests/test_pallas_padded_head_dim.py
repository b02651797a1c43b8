"""D < 128 models on the Pallas path via lane-padded KV pools.

The Mosaic kernels need 128-lane-aligned head_dim; rather than falling back
to XLA for D=64 models (BASELINE config 1, Llama-3.2-1B-class), the pool is
lane-padded to 128 and q/k/v are zero-padded at the kernel boundary
(`model_runner.kv_head_dim`, `ops/pallas/paged_attention.py`).  Zero K pad
lanes leave scores exact; zero V pad lanes slice off clean.

Reference behavior anchor: the reference serves D=64 models through its
fused attention path without backend downgrade
(`srt/layers/attention/ascend_backend.py`).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    # head_dim = 256/4 = 64: below the 128-lane tile
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        tie_word_embeddings=False,
        torch_dtype="float32",
        eos_token_id=2,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    d = tmp_path_factory.mktemp("d64_model")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_padded_pool_parity(model_dir, monkeypatch):
    """Pallas backend on a D=64 model: pool lane-padded to 128, greedy
    output and logprobs match the XLA backend exactly-ish."""
    monkeypatch.setenv("SGLANG_TPU_PALLAS_INTERPRET", "1")
    path, hf = model_dir
    common = dict(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=16, max_total_tokens=2048, random_seed=0,
    )
    ep = Engine(**common, attention_backend="pallas")
    ex = Engine(**common, attention_backend="xla")
    try:
        r = ep.model_runner
        assert r.attention_backend_name == "pallas"
        assert r.model_config.head_dim == 64
        assert r.kv_head_dim == 128
        assert r.kv_pool.shape[-1] == 128

        prompt = list(np.random.default_rng(0).integers(3, VOCAB, size=33))
        sp = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}
        op = ep.generate(input_ids=prompt, sampling_params=sp,
                         return_logprob=True)
        ox = ex.generate(input_ids=prompt, sampling_params=sp,
                         return_logprob=True)
        assert op["output_ids"] == ox["output_ids"]
        lp = [x[0] for x in op["meta_info"]["output_token_logprobs"]]
        lx = [x[0] for x in ox["meta_info"]["output_token_logprobs"]]
        np.testing.assert_allclose(lp, lx, atol=2e-3)

        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=12, do_sample=False
            )[0][len(prompt):].tolist()
        assert op["output_ids"] == ref

        # prefix reuse on the padded pool (second request shares the prompt)
        op2 = ep.generate(
            input_ids=prompt + op["output_ids"][:4],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert op2["output_ids"] == op["output_ids"][4:8]
    finally:
        ep.shutdown()
        ex.shutdown()


def test_gather_scatter_true_head_dim(model_dir, monkeypatch):
    """Host KV wire format (HiCache backup / PD handoff) stays at the true
    head_dim: gather drops the lane padding, scatter restores it."""
    monkeypatch.setenv("SGLANG_TPU_PALLAS_INTERPRET", "1")
    path, _ = model_dir
    e = Engine(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=16, max_total_tokens=2048, random_seed=0,
        attention_backend="pallas",
    )
    try:
        r = e.model_runner
        prompt = list(np.random.default_rng(1).integers(3, VOCAB, size=20))
        e.generate(input_ids=prompt, sampling_params={
            "max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True})
        slots = np.arange(8, dtype=np.int32)
        rows = r.gather_kv(slots)
        assert rows.shape[-1] == 64  # true head_dim on the wire
        r.scatter_kv(slots, rows)
        rows2 = r.gather_kv(slots)
        np.testing.assert_array_equal(rows, rows2)
    finally:
        e.shutdown()
