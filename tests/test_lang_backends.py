"""Third-party lang backends (reference lang/backend/{openai,anthropic,
litellm}.py): the OpenAI-protocol client runs sgl programs against this
engine's own OpenAI-compatible server — full wire-level coverage without
network egress.  Anthropic/LiteLLM share the client machinery (LiteLLM IS
the OpenAI client pointed at a proxy)."""

import os

import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.test_utils import kill_process_tree, popen_launch_server

BASE = "http://127.0.0.1:31359"


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("lang_backend_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    env = os.environ.copy()
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    env["SGLANG_TPU_FORCE_CPU"] = "1"
    proc = popen_launch_server(
        str(d),
        base_url=BASE,
        timeout=240,
        other_args=(
            "--dtype", "float32", "--tokenizer-mode", "byte",
            "--page-size", "4", "--max-total-tokens", "2048",
            "--attention-backend", "xla",
        ),
        env=env,
    )
    yield proc
    kill_process_tree(proc.pid)


def test_openai_backend_program(server):
    import sglang_npu_tpu.lang as sgl
    from sglang_npu_tpu.lang.backends import OpenAIBackend

    be = OpenAIBackend("default", base_url=BASE + "/v1", api_key="x")

    @sgl.function
    def prog(s):
        s += sgl.user("Say something: ")
        s += sgl.gen("ans", max_tokens=6, temperature=0.0, ignore_eos=True)

    st = prog.run(backend=be)
    assert isinstance(st["ans"], str)

    # select via echo+logprobs on /v1/completions
    scores = be.score("Once", " upon a time")
    assert scores and all(isinstance(x, float) for x in scores)

    @sgl.function
    def pick(s):
        s += sgl.user("Pick: ")
        s += sgl.select("c", choices=["alpha", "beta"])

    st2 = pick.run(backend=be)
    assert st2["c"] in ("alpha", "beta")


def test_litellm_backend_is_openai_client(server):
    from sglang_npu_tpu.lang.backends import LiteLLMBackend

    be = LiteLLMBackend("default", base_url=BASE + "/v1", api_key="x")
    out = be.generate("hi", {"max_new_tokens": 4, "temperature": 0.0})
    assert isinstance(out, str)


def test_anthropic_backend_shape():
    """No Anthropic endpoint reachable here: validate request mapping and
    the documented select limitation."""
    from sglang_npu_tpu.lang.backends import AnthropicBackend

    be = AnthropicBackend("claude-x", base_url="http://127.0.0.1:1", api_key="k")
    with pytest.raises(NotImplementedError):
        be.score("a", "b")
    with pytest.raises(Exception):  # connection refused, not a crash
        be.generate("hi", {"max_new_tokens": 2})


def test_vertexai_backend_request_shape(monkeypatch):
    """VertexAI client (reference lang/backend/vertexai.py): request maps
    to generateContent with generationConfig; response parts concatenate."""
    from sglang_npu_tpu.lang import backends as B

    seen = {}

    def fake_post(url, payload, headers, timeout):
        seen["url"] = url
        seen["payload"] = payload
        seen["headers"] = headers
        return {
            "candidates": [
                {"content": {"parts": [{"text": "Hel"}, {"text": "lo"}]}}
            ]
        }

    monkeypatch.setattr(B, "_post_json", fake_post)
    be = B.VertexAIBackend(
        "gemini-pro", project="p1", access_token="tok123"
    )
    out = be.generate(
        "hi", {"max_new_tokens": 7, "temperature": 0.5, "top_p": 0.9}
    )
    assert out == "Hello"
    assert ":generateContent" in seen["url"] and "p1" in seen["url"]
    cfg = seen["payload"]["generationConfig"]
    assert cfg["maxOutputTokens"] == 7 and cfg["temperature"] == 0.5
    assert seen["headers"]["Authorization"] == "Bearer tok123"
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        be.score("a", "b")
