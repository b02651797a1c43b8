"""Multi-LoRA serving vs peft-merged reference (reference `srt/lora/` +
`test/srt/models/test_lora.py` pattern)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
peft = pytest.importorskip("peft")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    base = transformers.LlamaForCausalLM(cfg)
    base_dir = tmp_path_factory.mktemp("lora_base")
    base.save_pretrained(base_dir, safe_serialization=True)

    lcfg = peft.LoraConfig(
        r=8, lora_alpha=16,
        target_modules=["q_proj", "v_proj", "gate_proj", "down_proj"],
        init_lora_weights=False,  # random A AND B -> nonzero delta
    )
    torch.manual_seed(1)
    base2 = transformers.LlamaForCausalLM(cfg)
    base2.load_state_dict(base.state_dict())
    pmodel = peft.get_peft_model(base2, lcfg)
    adapter_dir = tmp_path_factory.mktemp("lora_adapter")
    pmodel.save_pretrained(adapter_dir)
    adapter_path = str(adapter_dir)
    import os
    if not os.path.exists(os.path.join(adapter_path, "adapter_model.safetensors")):
        adapter_path = os.path.join(adapter_path, "default")

    merged = pmodel.merge_and_unload()
    merged.eval()
    return str(base_dir), adapter_path, base, merged


def test_lora_matches_merged(setup):
    base_dir, adapter_path, base, merged = setup
    e = Engine(
        model_path=base_dir, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0, lora_paths=[f"adapter1={adapter_path}"],
    )
    try:
        prompt = list(np.random.default_rng(0).integers(3, VOCAB, size=12))
        sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}

        # without adapter -> base model behavior
        o_base = e.generate(input_ids=prompt, sampling_params=sp)
        with torch.no_grad():
            ref_base = base.generate(
                torch.tensor([prompt]), max_new_tokens=6, do_sample=False
            )[0][12:].tolist()
        assert o_base["output_ids"] == ref_base

        # with adapter -> merged model behavior
        o_lora = e.generate(
            input_ids=prompt, sampling_params=sp, lora_path="adapter1"
        )
        with torch.no_grad():
            ref_lora = merged.generate(
                torch.tensor([prompt]), max_new_tokens=6, do_sample=False
            )[0][12:].tolist()
        assert o_lora["output_ids"] == ref_lora
        assert o_lora["output_ids"] != o_base["output_ids"]

        # mixed batch: adapter and no-adapter side by side
        outs = e.generate(
            input_ids=[prompt, prompt],
            sampling_params=sp,
            lora_path=["adapter1", None],
        )
        assert outs[0]["output_ids"] == ref_lora
        assert outs[1]["output_ids"] == ref_base
    finally:
        e.shutdown()


def test_dynamic_lora_load_unload(setup):
    """Runtime adapter management (reference `/load_lora_adapter` /
    `/unload_lora_adapter`, `http_server.py:625-643`): a server launched
    with --enable-lora and no adapters loads one at runtime, serves it,
    unloads it (slot freed), and reuses the freed slot without a shape
    change."""
    base_dir, adapter_path, base, merged = setup
    e = Engine(
        model_path=base_dir, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0, enable_lora=True,
    )
    try:
        prompt = list(np.random.default_rng(7).integers(3, VOCAB, size=10))
        sp = {"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True}

        def hf_ref(m):
            with torch.no_grad():
                return m.generate(
                    torch.tensor([prompt]), max_new_tokens=5, do_sample=False
                )[0][len(prompt):].tolist()

        base.eval()
        # no adapters yet: base behavior, unknown adapter name -> slot 0
        out0 = e.generate(input_ids=prompt, sampling_params=sp)
        assert out0["output_ids"] == hf_ref(base)

        ok, msg = e.load_lora_adapter("dyn1", adapter_path)
        assert ok, msg
        out1 = e.generate(
            input_ids=prompt, sampling_params=sp, lora_path="dyn1"
        )
        assert out1["output_ids"] == hf_ref(merged)

        ok, msg = e.unload_lora_adapter("dyn1")
        assert ok, msg
        out2 = e.generate(
            input_ids=prompt, sampling_params=sp, lora_path="dyn1"
        )
        assert out2["output_ids"] == hf_ref(base)

        # freed slot reuse: shapes unchanged -> same stacked adapter dim
        n_before = e.model_runner.params["lora_scaling"].shape[0]
        ok, msg = e.load_lora_adapter("dyn2", adapter_path)
        assert ok, msg
        assert e.model_runner.params["lora_scaling"].shape[0] == n_before
        out3 = e.generate(
            input_ids=prompt, sampling_params=sp, lora_path="dyn2"
        )
        assert out3["output_ids"] == hf_ref(merged)

        # double-load and unknown unload are clean errors
        assert not e.load_lora_adapter("dyn2", adapter_path)[0]
        assert not e.unload_lora_adapter("nope")[0]
    finally:
        e.shutdown()
