"""Pipeline parallelism on the virtual CPU mesh.

Reference behaviors: pp_rank plumbing + micro-batch 1F1B in the reference's
scheduler/tp_worker — here realized TPU-natively as ONE SPMD program: the
stacked layer dim (weights AND the KV pool) shards over a 'pipe' mesh axis
in L/S slabs, and a GPipe schedule runs inside a manual-'pipe' shard_map
with `ppermute` hops between stages (`models/llama.py
_pp_backbone_forward`).  'model' stays GSPMD-auto inside, so PP composes
with TP.

Greedy outputs must exactly match single-chip HF generation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def _llama_cfg(layers=2):
    return transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=layers, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        tie_word_embeddings=False, torch_dtype="float32", eos_token_id=2,
    )


def _hf_ref(hf, prompts, n):
    refs = []
    for p in prompts:
        with torch.no_grad():
            refs.append(
                hf.generate(
                    torch.tensor([p]), max_new_tokens=n, do_sample=False
                )[0][len(p):].tolist()
            )
    return refs


@pytest.mark.parametrize("pp,tp,layers", [(2, 1, 2), (2, 2, 4), (4, 1, 4)])
def test_pp_matches_hf(tmp_path_factory, pp, tp, layers):
    if jax.device_count() < pp * tp:
        pytest.skip("not enough devices")
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(_llama_cfg(layers))
    hf.eval()
    d = tmp_path_factory.mktemp(f"pp{pp}x{tp}")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0, pp_size=pp, tp_size=tp,
    )
    try:
        runner = e.model_runner
        # weights and pool sharded over the pipe axis on the layer dim
        assert runner.params["layers"]["wq"].sharding.spec[0] == "pipe"
        assert runner.kv_pool.sharding.spec[0] == "pipe"

        rng = np.random.default_rng(0)
        prompts = [
            rng.integers(3, VOCAB, size=k).tolist() for k in (6, 14, 25, 5)
        ]
        outs = e.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "ignore_eos": True},
        )
        refs = _hf_ref(hf, prompts, 8)
        for o, ref in zip(outs, refs):
            assert o["output_ids"] == ref, (o["output_ids"], ref)

        # single-request decode (bucket < pp forces the bucket floor)
        one = e.generate(
            input_ids=[prompts[0]],
            sampling_params={"max_new_tokens": 5, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert one[0]["output_ids"] == refs[0][:5]
    finally:
        e.shutdown()


def test_pp_qwen_moe_matches_hf(tmp_path_factory):
    """PP over a scan-based MoE model (dense EP off): the layer slab scan
    includes routed experts."""
    if jax.device_count() < 2:
        pytest.skip("not enough devices")
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, shared_expert_intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2, decoder_sparse_step=1,
        mlp_only_layers=[],
    )
    torch.manual_seed(0)
    hf = transformers.Qwen2MoeForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("pp_qwenmoe")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0, pp_size=2, tp_size=1,
    )
    try:
        rng = np.random.default_rng(1)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (6, 13)]
        outs = e.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                             "ignore_eos": True},
        )
        refs = _hf_ref(hf, prompts, 6)
        for o, ref in zip(outs, refs):
            assert o["output_ids"] == ref
    finally:
        e.shutdown()


def test_pp_rejects_unsupported(tmp_path_factory):
    if jax.device_count() < 2:
        pytest.skip("not enough devices")
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("pp_bad")
    transformers.LlamaForCausalLM(_llama_cfg(3)).save_pretrained(
        d, safe_serialization=True
    )
    with pytest.raises(Exception, match="divisible"):
        Engine(
            model_path=str(d), dtype="float32", skip_tokenizer_init=True,
            page_size=4, max_total_tokens=1024, attention_backend="xla",
            random_seed=0, pp_size=2,
        )


def test_pp_pallas_backend_matches_hf(tmp_path_factory, monkeypatch):
    """PP with the Pallas attention kernels (round-4: PP is no longer an
    XLA-only walled garden — reference PP composes with every backend,
    `scheduler.py:815`).  Inactive GPipe ticks are neutralized by zeroed
    seq_lens (the fused kernel's in-place write targets seq_len-1)."""
    if jax.device_count() < 2:
        pytest.skip("not enough devices")
    monkeypatch.setenv("SGLANG_TPU_PALLAS_INTERPRET", "1")
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(_llama_cfg(2))
    hf.eval()
    d = tmp_path_factory.mktemp("pp_pallas")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="pallas",
        random_seed=0, pp_size=2, tp_size=1,
    )
    try:
        rng = np.random.default_rng(2)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (6, 14)]
        refs = _hf_ref(hf, prompts, 6)
        n = min(len(r) for r in refs)  # HF stops at EOS; compare prefix
        outs = e.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                             "ignore_eos": True},
        )
        for o, ref in zip(outs, refs):
            assert o["output_ids"][: len(ref)] == ref, (o["output_ids"], ref)
    finally:
        e.shutdown()


def test_pp_lora_matches_merged(tmp_path_factory):
    """PP + multi-LoRA (round-4: the LoRA exclusion is lifted; adapters
    shard over the pipe axis with the rest of the stacked weights)."""
    peft = pytest.importorskip("peft")
    if jax.device_count() < 2:
        pytest.skip("not enough devices")
    cfg = _llama_cfg(2)
    torch.manual_seed(0)
    base = transformers.LlamaForCausalLM(cfg)
    base_dir = tmp_path_factory.mktemp("pp_lora_base")
    base.save_pretrained(base_dir, safe_serialization=True)
    lcfg = peft.LoraConfig(
        r=4, lora_alpha=8,
        target_modules=["q_proj", "v_proj", "gate_proj"],
        init_lora_weights=False,
    )
    torch.manual_seed(1)
    base2 = transformers.LlamaForCausalLM(cfg)
    base2.load_state_dict(base.state_dict())
    pmodel = peft.get_peft_model(base2, lcfg)
    adapter_dir = tmp_path_factory.mktemp("pp_lora_adapter")
    pmodel.save_pretrained(adapter_dir)
    import os as _os
    adapter_path = str(adapter_dir)
    if not _os.path.exists(
        _os.path.join(adapter_path, "adapter_model.safetensors")
    ):
        adapter_path = _os.path.join(adapter_path, "default")
    merged = pmodel.merge_and_unload()
    merged.eval()

    e = Engine(
        model_path=str(base_dir), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0, pp_size=2, tp_size=1,
        lora_paths=[f"adapter1={adapter_path}"],
    )
    try:
        rng = np.random.default_rng(3)
        prompts = [rng.integers(3, VOCAB, size=k).tolist() for k in (7, 11)]
        sp = {"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True}
        # adapter on: matches the peft-merged model
        outs = e.generate(
            input_ids=prompts, sampling_params=sp,
            lora_path=["adapter1", "adapter1"],
        )
        refs = _hf_ref(merged, prompts, 5)
        for o, ref in zip(outs, refs):
            assert o["output_ids"] == ref, (o["output_ids"], ref)
        # adapter off: matches the base model
        outs0 = e.generate(input_ids=prompts, sampling_params=sp)
        refs0 = _hf_ref(base.eval(), prompts, 5)
        for o, ref in zip(outs0, refs0):
            assert o["output_ids"] == ref, (o["output_ids"], ref)
    finally:
        e.shutdown()
