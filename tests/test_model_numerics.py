"""HF-diff numerics: compare our functional Llama against HuggingFace
transformers (torch CPU) — the reference's SRTRunner/HFRunner pattern
(`python/sglang/test/runners.py`, SURVEY.md §4)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.configs.model_config import ModelConfig
from sglang_npu_tpu.managers.schedule_batch import Req, ScheduleBatch
from sglang_npu_tpu.mem_cache.allocator import PagedAllocator
from sglang_npu_tpu.mem_cache.radix_cache import RadixCache
from sglang_npu_tpu.model_executor.model_runner import ModelRunner
from sglang_npu_tpu.sampling.sampling_params import SamplingParams
from sglang_npu_tpu.server_args import ServerArgs

PS = 4
VOCAB = 128


@pytest.fixture(scope="module")
def tiny_llama_dir(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        torch_dtype="float32",
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("tiny_llama")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def make_runner(path, **kw):
    args = ServerArgs(
        model_path=path,
        dtype="float32",
        page_size=PS,
        max_total_tokens=4096,
        attention_backend="xla",
        skip_tokenizer_init=True,
        random_seed=0,
        **kw,
    )
    cfg = ModelConfig.from_model_path(path, dtype="float32")
    return args, ModelRunner(args, cfg)


def run_extend(runner, allocator, cache, reqs):
    for r in reqs:
        r.init_next_round_input(cache, PS)
    b = ScheduleBatch.init_new(reqs, allocator, cache)
    mwb = b.prepare_for_extend()
    return b, runner.forward_logits(mwb)


def mkreq(rid, ids):
    return Req(
        rid=rid,
        origin_input_text=None,
        origin_input_ids=list(ids),
        sampling_params=SamplingParams(max_new_tokens=32, ignore_eos=True, temperature=0.0),
    )


def test_prefill_logits_match_hf(tiny_llama_dir):
    path, hf_model = tiny_llama_dir
    args, runner = make_runner(path)
    allocator = PagedAllocator(runner.num_pages, PS)
    cache = RadixCache(allocator, PS)

    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, VOCAB, size=n).tolist() for n in (5, 13, 29)]
    reqs = [mkreq(f"r{i}", p) for i, p in enumerate(prompts)]
    _, ours = run_extend(runner, allocator, cache, reqs)

    for i, p in enumerate(prompts):
        with torch.no_grad():
            hf_logits = hf_model(torch.tensor([p])).logits[0, -1].numpy()
        np.testing.assert_allclose(ours[i], hf_logits, rtol=2e-3, atol=2e-3)


def test_greedy_decode_matches_hf(tiny_llama_dir):
    path, hf_model = tiny_llama_dir
    args, runner = make_runner(path)
    allocator = PagedAllocator(runner.num_pages, PS)
    cache = RadixCache(allocator, PS)

    prompt = list(np.random.default_rng(2).integers(0, VOCAB, size=11))
    ours = []
    allocator2 = PagedAllocator(runner.num_pages, PS)
    cache2 = RadixCache(allocator2, PS)
    req2 = mkreq("g2", prompt)
    b2, logits0 = run_extend(runner, allocator2, cache2, [req2])
    tok = int(np.argmax(logits0[0]))
    ours.append(tok)
    for _ in range(7):
        req2.output_ids.append(tok)
        req2.fill_ids.append(tok)
        mwb = b2.prepare_for_decode()
        logits_d = runner.forward_logits(mwb)
        tok = int(np.argmax(logits_d[0]))
        ours.append(tok)

    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor([prompt]),
            max_new_tokens=8,
            do_sample=False,
            use_cache=True,
        )[0][len(prompt):].tolist()
    assert ours == hf_out


def test_prefix_cache_reuse_same_logits(tiny_llama_dir):
    path, _ = tiny_llama_dir
    args, runner = make_runner(path)
    allocator = PagedAllocator(runner.num_pages, PS)
    cache = RadixCache(allocator, PS)

    rng = np.random.default_rng(3)
    shared = rng.integers(0, VOCAB, size=16).tolist()
    p1 = shared + rng.integers(0, VOCAB, size=5).tolist()
    p2 = shared + rng.integers(0, VOCAB, size=7).tolist()

    r1 = mkreq("a", p1)
    b1, l1 = run_extend(runner, allocator, cache, [r1])
    # publish r1's kv into the tree
    r1.output_ids = [1]
    r1.fill_ids = p1 + [1]
    cache.cache_finished_req(r1)

    # r2 shares 16-token prefix -> must reuse and still match a fresh run
    r2 = mkreq("b", p2)
    b2, l2 = run_extend(runner, allocator, cache, [r2])
    assert r2.prefix_len == 16

    # fresh engine, no cache
    runner2 = ModelRunner(args, runner.model_config)
    alloc3 = PagedAllocator(runner2.num_pages, PS)
    cache3 = RadixCache(alloc3, PS)
    r3 = mkreq("c", p2)
    _, l3 = run_extend(runner2, alloc3, cache3, [r3])
    np.testing.assert_allclose(l2[0], l3[0], rtol=2e-3, atol=2e-3)


def test_exotic_config_normalization():
    """Exotic arch config field names normalize into ModelConfig
    (reference `srt/configs/` chatglm/deepseekvl2/kimi_vl)."""
    from sglang_npu_tpu.configs.model_config import ModelConfig

    chatglm = ModelConfig.from_hf_dict({
        "model_type": "chatglm",
        "architectures": ["ChatGLMModel"],
        "hidden_size": 4096, "num_layers": 28, "num_attention_heads": 32,
        "multi_query_attention": True, "multi_query_group_num": 2,
        "ffn_hidden_size": 13696, "seq_length": 8192,
        "padded_vocab_size": 65024, "layernorm_epsilon": 1e-5,
        "kv_channels": 128, "torch_dtype": "bfloat16",
    })
    assert chatglm.num_hidden_layers == 28
    assert chatglm.num_key_value_heads == 2
    assert chatglm.intermediate_size == 13696
    assert chatglm.vocab_size == 65024
    assert chatglm.max_position_embeddings == 8192

    vl2 = ModelConfig.from_hf_dict({
        "model_type": "deepseek_vl_v2",
        "architectures": ["DeepseekVLV2ForCausalLM"],
        "language_config": {
            "architectures": ["DeepseekV2ForCausalLM"],
            "hidden_size": 1280, "num_hidden_layers": 12,
            "num_attention_heads": 10, "num_key_value_heads": 10,
            "intermediate_size": 6848, "vocab_size": 102400,
            "max_position_embeddings": 4096, "torch_dtype": "bfloat16",
            "kv_lora_rank": 512, "qk_nope_head_dim": 128,
            "qk_rope_head_dim": 64, "v_head_dim": 128,
        },
    })
    assert vl2.hidden_size == 1280
    assert vl2.kv_lora_rank == 512

    kimi = ModelConfig.from_hf_dict({
        "model_type": "kimi_vl",
        "architectures": ["KimiVLForConditionalGeneration"],
        "llm_config": {
            "hidden_size": 2048, "num_hidden_layers": 27,
            "num_attention_heads": 16, "num_key_value_heads": 16,
            "intermediate_size": 11264, "vocab_size": 163840,
            "max_position_embeddings": 131072, "torch_dtype": "bfloat16",
        },
    })
    assert kimi.hidden_size == 2048
    assert kimi.num_hidden_layers == 27
