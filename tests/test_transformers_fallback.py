"""Generic `transformers` fallback (reference `srt/models/transformers.py`
+ --model-impl): an HF architecture with NO native implementation serves
through the full engine via HF torch modeling code, with exact greedy
parity against model.generate."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


# tiny random models have near-tie argmax rows; different torch thread
# reduction orders flip them between hf.generate and the runner's
# incremental path — pin to one thread for a deterministic reference
torch.set_num_threads(1)


@pytest.fixture(scope="module")
def opt_dir(tmp_path_factory):
    # OPT is NOT in the native registry -> exercises the auto fallback
    cfg = transformers.OPTConfig(
        vocab_size=VOCAB, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        word_embed_proj_dim=32, eos_token_id=2, pad_token_id=1,
        bos_token_id=0, torch_dtype="float32",
    )
    torch.manual_seed(0)
    m = transformers.OPTForCausalLM(cfg)
    m.eval()  # OPT defaults to dropout=0.1 — train mode would make the
    # HF reference stochastic
    d = tmp_path_factory.mktemp("opt_model")
    m.save_pretrained(d, safe_serialization=True)
    return str(d), m


def test_unregistered_arch_serves_via_fallback(opt_dir):
    from sglang_npu_tpu.model_executor.torch_fallback import (
        TorchFallbackRunner,
    )

    path, hf = opt_dir
    e = Engine(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, random_seed=0,
    )
    try:
        assert isinstance(e.model_runner, TorchFallbackRunner)
        rng = np.random.default_rng(0)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (5, 9)]
        outs = e.generate(
            input_ids=prompts,
            sampling_params={
                "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True
            },
        )
        for p, o in zip(prompts, outs):
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([p]), max_new_tokens=8, do_sample=False
                )[0][len(p):].tolist()
            assert o["output_ids"] == ref, (o["output_ids"], ref)
        # streaming + flush also work through the fallback
        chunks = list(
            e.generate(
                input_ids=prompts[0],
                sampling_params={
                    "max_new_tokens": 6, "temperature": 0.0,
                    "ignore_eos": True,
                },
                stream=True,
            )
        )
        assert chunks and len(chunks[-1]["output_ids"]) == 6
        assert e.flush_cache()
    finally:
        e.shutdown()


def test_model_impl_transformers_forces_fallback(opt_dir):
    """--model-impl transformers forces the fallback even for natively
    supported architectures."""
    from sglang_npu_tpu.model_executor.torch_fallback import (
        TorchFallbackRunner,
    )

    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(1)
    import tempfile

    d = tempfile.mkdtemp()
    m = transformers.LlamaForCausalLM(cfg)
    m.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=d, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, random_seed=0,
        model_impl="transformers",
    )
    try:
        assert isinstance(e.model_runner, TorchFallbackRunner)
        out = e.generate(
            input_ids=[5, 9, 11],
            sampling_params={
                "max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True
            },
        )
        with torch.no_grad():
            ref = m.generate(
                torch.tensor([[5, 9, 11]]), max_new_tokens=5, do_sample=False
            )[0][3:].tolist()
        assert out["output_ids"] == ref
    finally:
        e.shutdown()
