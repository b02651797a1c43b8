"""OpenAI n>1 parallel sampling and logit_bias.

Reference behaviors: `srt/entrypoints/openai/serving_*` n handling and
`sampling_batch_info` logit_bias application.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from aiohttp.test_utils import TestClient, TestServer

from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.entrypoints.http_server import HttpServer

VOCAB = 512


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=257,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("nlb_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    e = Engine(
        model_path=str(d), dtype="float32", tokenizer_mode="byte",
        page_size=4, max_total_tokens=4096, attention_backend="xla",
        random_seed=0,
    )
    yield e
    e.shutdown()


def test_logit_bias_forces_and_forbids(engine):
    # +100 on one token forces it under greedy; -100 forbids it
    forced = 321
    out = engine.generate(
        "bias me: ",
        {"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True,
         "logit_bias": {str(forced): 100.0}},
    )
    assert out["output_ids"] == [forced] * 5

    base = engine.generate(
        "pick: ",
        {"max_new_tokens": 1, "temperature": 0.0, "ignore_eos": True},
    )
    top = base["output_ids"][0]
    banned = engine.generate(
        "pick: ",
        {"max_new_tokens": 1, "temperature": 0.0, "ignore_eos": True,
         "logit_bias": {str(top): -100.0}},
    )
    assert banned["output_ids"][0] != top


def test_logit_bias_in_decode_window(engine):
    # multi-step fused decode also applies the bias every step
    out = engine.generate(
        "window: ",
        {"max_new_tokens": 8, "temperature": 0.8, "ignore_eos": True,
         "logit_bias": {"77": 100.0}},
    )
    assert out["output_ids"] == [77] * 8


async def test_chat_n_choices(engine, loop):
    client = TestClient(TestServer(HttpServer(engine).build_app()))
    await client.start_server()
    try:
        resp = await client.post("/v1/chat/completions", json={
            "model": "m", "max_tokens": 6, "temperature": 0.9, "n": 3,
            "ignore_eos": True,
            "messages": [{"role": "user", "content": "hi"}],
        })
        assert resp.status == 200
        data = await resp.json()
        assert [c["index"] for c in data["choices"]] == [0, 1, 2]
        texts = [c["message"]["content"] for c in data["choices"]]
        assert len(set(texts)) > 1  # sampling diversity across choices
        assert data["usage"]["completion_tokens"] == 18

        # n>1 + stream rejected loudly
        resp = await client.post("/v1/chat/completions", json={
            "model": "m", "max_tokens": 2, "n": 2, "stream": True,
            "messages": [{"role": "user", "content": "hi"}],
        })
        assert resp.status == 400

        resp = await client.post("/v1/completions", json={
            "model": "m", "max_tokens": 4, "temperature": 0.9, "n": 2,
            "prompt": "count: ", "ignore_eos": True,
        })
        assert resp.status == 200
        data = await resp.json()
        assert len(data["choices"]) == 2
        assert data["usage"]["prompt_tokens"] == 7  # billed once
    finally:
        await client.close()
