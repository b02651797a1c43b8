"""Frontend DSL tests (reference `test/lang/test_srt_backend.py` pattern)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import sglang_npu_tpu.lang as sgl
from sglang_npu_tpu.entrypoints.engine import Engine
from sglang_npu_tpu.lang import EngineBackend


@pytest.fixture(scope="module")
def backend(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, torch_dtype="float32", eos_token_id=257,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("lang_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", tokenizer_mode="byte",
        page_size=4, max_total_tokens=8192, attention_backend="xla",
        random_seed=0,
    )
    b = EngineBackend(e)
    sgl.set_default_backend(b)
    yield b
    e.shutdown()


def test_simple_gen(backend):
    @sgl.function
    def hello(s):
        s += "Say something: "
        s += sgl.gen("out", max_tokens=6, temperature=0.0, ignore_eos=True)

    state = hello.run()
    assert len(state["out"]) > 0
    assert state.text.startswith("Say something: ")
    assert state.text.endswith(state["out"])


def test_chat_roles_and_multi_gen(backend):
    @sgl.function
    def chat(s, q):
        s += sgl.system("You are terse.")
        s += sgl.user(q)
        s += sgl.assistant(sgl.gen("a1", max_tokens=4, temperature=0.0, ignore_eos=True))
        s += sgl.user("and more?")
        s += sgl.assistant(sgl.gen("a2", max_tokens=4, temperature=0.0, ignore_eos=True))

    state = chat.run(q="hi")
    assert state["a1"] and state["a2"]
    assert state.messages[0]["role"] == "system"
    assert state.messages[-1]["content"] == state["a2"]


def test_select(backend):
    @sgl.function
    def pick(s):
        s += "The answer is "
        s += sgl.select("choice", choices=["yes", "no"])

    state = pick.run()
    assert state["choice"] in ("yes", "no")
    # deterministic given greedy scoring
    state2 = pick.run()
    assert state2["choice"] == state["choice"]


def test_run_batch(backend):
    @sgl.function
    def f(s, x):
        s += f"echo {x}: "
        s += sgl.gen("o", max_tokens=3, temperature=0.0, ignore_eos=True)

    states = f.run_batch([{"x": "a"}, {"x": "b"}])
    assert len(states) == 2
    assert all(st["o"] for st in states)


def test_regex_constrained_gen(backend):
    import re

    @sgl.function
    def num(s):
        s += "Number: "
        s += sgl.gen("n", max_tokens=8, temperature=0.7, regex=r"\d{3}")

    state = num.run()
    assert re.fullmatch(r"\d{3}", state["n"]), state["n"]


def test_fork_branches_independent(backend):
    @sgl.function
    def tool_use(s, question):
        s += "Q: " + question + "\n"
        forks = s.fork(3)
        forks.map(
            lambda f, i: f.append(
                sgl.gen(f"ans{i}", max_tokens=4 + i, temperature=0.0,
                        ignore_eos=True)
            )
        )
        # branches diverged independently; parent unchanged
        for i, f in enumerate(forks):
            assert len(f[f"ans{i}"]) > 0
            assert f.text.startswith("Q: " + question + "\n")
        assert "ans0" not in s.variables
        s += sgl.gen("final", max_tokens=3, temperature=0.0, ignore_eos=True)

    st = tool_use.run(question="why?")
    assert len(st["final"]) > 0


def test_fork_map_parallel_equals_serial(backend):
    @sgl.function
    def prog(s):
        s += "count: "
        forks = s.fork(2)
        forks.map(
            lambda f, i: f.append(
                sgl.gen("x", max_tokens=5, temperature=0.0, ignore_eos=True)
            ),
            parallel=True,
        )
        s.variables["a"] = forks[0]["x"]
        s.variables["b"] = forks[1]["x"]

    st = prog.run()
    # same prefix + greedy -> both branches sample identical continuations
    assert st["a"] == st["b"]


def test_run_batch_parallel(backend):
    @sgl.function
    def prog(s, prefix):
        s += prefix
        s += sgl.gen("out", max_tokens=4, temperature=0.0, ignore_eos=True)

    outs = prog.run_batch(
        [{"prefix": f"p{i}: "} for i in range(4)], num_threads=4
    )
    assert len(outs) == 4
    for i, st in enumerate(outs):
        assert st.text.startswith(f"p{i}: ")
        assert len(st["out"]) > 0


def test_trace_graph_structure(backend):
    @sgl.function
    def prog(s, topic):
        s += "Topic: " + topic + ". "
        s += sgl.gen("draft", max_tokens=4, temperature=0.0, ignore_eos=True)
        s += " verdict: "
        s += sgl.select("verdict", choices=["good", "bad"])

    tp = prog.trace()
    g = tp.graph()
    assert tp.arg_names == ["topic"]
    kinds = [type(n).__name__ for n in tp.nodes]
    assert kinds == ["TextNode", "GenNode", "TextNode", "SelectNode"], kinds
    assert "select name=verdict" in g and "choices=['good', 'bad']" in g
    # argument marker captured in the constant text
    assert "⟦arg:topic⟧" in tp.nodes[0].text


def test_compiled_run_matches_imperative(backend):
    @sgl.function
    def prog(s, word):
        s += "Echo " + word + ": "
        s += sgl.gen("out", max_tokens=5, temperature=0.0, ignore_eos=True)

    direct = prog.run("alpha")
    compiled = prog.compile()
    replay = compiled.run(word="alpha")
    assert replay["out"] == direct["out"]
    assert replay.text == direct.text
    # batch replay
    outs = compiled.run_batch([{"word": "alpha"}, {"word": "beta"}])
    assert outs[0]["out"] == direct["out"]
    assert outs[1].text.startswith("Echo beta: ")


def test_select_methods(backend):
    @sgl.function
    def pick(s, method):
        s += "The answer is "
        s += sgl.select("c", choices=["yes", "no"], method=method)

    for method in (
        "token_length_normalized",
        "greedy_token",
        "unconditional_likelihood_normalized",
    ):
        st = pick.run(method)
        assert st["c"] in ("yes", "no"), method
        assert st["c_meta"], method


def test_choices_methods_unit():
    from sglang_npu_tpu.lang.choices import CHOICES_METHODS

    # option B has better mean; A has better first token
    lp = {"A": [-0.1, -9.0, -9.0], "B": [-0.5, -0.5]}
    choices = list(lp)
    tln = CHOICES_METHODS["token_length_normalized"](
        choices=choices, token_logprobs=list(lp.values())
    )
    assert tln.decision == "B"
    greedy = CHOICES_METHODS["greedy_token"](
        choices=choices, token_logprobs=list(lp.values())
    )
    assert greedy.decision == "A"
    # unconditional: B is common unconditionally -> A wins after normalizing
    un = CHOICES_METHODS["unconditional_likelihood_normalized"](
        choices=choices,
        token_logprobs=list(lp.values()),
        unconditional_logprobs=[[None, -9.0, -9.0], [-0.1, -0.1]],
    )
    assert un.decision == "A"
