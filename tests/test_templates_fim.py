"""Named chat templates, FIM completion templates, warmup.

Reference behaviors: `srt/conversation.py` (named template registry +
model matching), `srt/code_completion_parser.py` (FIM prompt formats),
`srt/warmup.py` (pre-serve warmup request).
"""

import json

import pytest

from sglang_npu_tpu.code_completion import (
    build_fim_prompt,
    match_completion_template,
)
from sglang_npu_tpu.conversation import (
    get_conv_template,
    load_template,
    match_model_template,
)

MSGS = [
    {"role": "system", "content": "Be brief."},
    {"role": "user", "content": "hi"},
    {"role": "assistant", "content": "hello"},
    {"role": "user", "content": "bye"},
]


def test_llama3_template():
    conv = get_conv_template("llama-3")
    out = conv.render(MSGS)
    assert out.startswith("<|begin_of_text|>")
    assert "<|start_header_id|>system<|end_header_id|>\n\nBe brief.<|eot_id|>" in out
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
    assert out.count("<|eot_id|>") == 4  # system + 3 turns


def test_chatml_template_and_aliases():
    conv = get_conv_template("chatml")
    out = conv.render([{"role": "user", "content": "hi"}])
    assert out == (
        "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n"
    )
    assert get_conv_template("qwen2.5") is conv
    assert "<|im_end|>" in conv.stop_strs


def test_model_path_matching():
    assert match_model_template("/models/Meta-Llama-3.1-8B-Instruct").name == "llama-3"
    assert match_model_template("Qwen/Qwen2.5-7B-Instruct").name == "chatml"
    assert match_model_template("google/gemma-2-9b-it").name == "gemma-it"
    assert match_model_template("deepseek-ai/DeepSeek-V2-Lite").name == "deepseek"
    assert match_model_template("unknown/model") is None


def test_custom_template_file(tmp_path):
    p = tmp_path / "tpl.json"
    p.write_text(json.dumps({
        "name": "mytpl",
        "roles": {"user": ["U:", "\n"], "assistant": ["A:", "\n"]},
        "assistant_prefix": "A:",
        "stop_strs": ["\n"],
    }))
    conv = load_template(str(p))
    assert conv.render([{"role": "user", "content": "x"}]) == "U:x\nA:"
    # registered by name afterwards
    assert get_conv_template("mytpl") is conv


def test_unknown_template_rejected():
    with pytest.raises(ValueError, match="unknown chat template"):
        load_template("no-such-template")


# ----------------------------------------------------------------------
def test_fim_formats():
    p = build_fim_prompt("def f():", "    return x", "deepseek-coder-6.7b")
    assert p == "<｜fim▁begin｜>def f():<｜fim▁hole｜>    return x<｜fim▁end｜>"
    p = build_fim_prompt("a", "b", "Qwen2.5-Coder-7B")
    assert p == "<|fim_prefix|>a<|fim_suffix|>b<|fim_middle|>"
    p = build_fim_prompt("a", "b", "starcoder2-3b")
    assert p == "<fim_prefix>a<fim_suffix>b<fim_middle>"
    # explicit template name overrides the path match
    p = build_fim_prompt("a", "b", "whatever", template_name="codellama")
    assert p == "<PRE> a <SUF>b <MID>"
    with pytest.raises(ValueError, match="completion-template"):
        build_fim_prompt("a", "b", "some-random-llama")
    assert match_completion_template("gpt2") is None


# ----------------------------------------------------------------------
async def test_chat_template_and_fim_over_http(tmp_path_factory, loop):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from aiohttp.test_utils import TestClient, TestServer

    from sglang_npu_tpu.entrypoints.engine import Engine
    from sglang_npu_tpu.entrypoints.http_server import HttpServer

    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("tplmodel")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    e = Engine(
        model_path=str(d), dtype="float32", tokenizer_mode="byte",
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, chat_template="chatml",
        completion_template="qwen-coder",
    )
    client = TestClient(TestServer(HttpServer(e).build_app()))
    await client.start_server()
    try:
        resp = await client.post("/v1/chat/completions", json={
            "model": "m", "max_tokens": 4, "temperature": 0,
            "messages": [{"role": "user", "content": "hi"}],
        })
        assert resp.status == 200
        data = await resp.json()
        assert data["choices"][0]["message"]["role"] == "assistant"
        # the named template's prompt was used: session echoes aren't
        # visible, but the request round-trips with the injected stop strs

        resp = await client.post("/v1/completions", json={
            "model": "m", "max_tokens": 4, "temperature": 0,
            "prompt": "def f():", "suffix": "return", "ignore_eos": True,
        })
        assert resp.status == 200

        # unknown-template model without completion_template -> 400
        e.server_args.completion_template = None
        e.server_args.model_path = "mystery-model"
        resp = await client.post("/v1/completions", json={
            "model": "m", "max_tokens": 4,
            "prompt": "x", "suffix": "y",
        })
        assert resp.status == 400
    finally:
        await client.close()
        e.shutdown()
