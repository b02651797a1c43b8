"""Structured-output tests: regex FSM engine, JSON-schema regex, token
masking, and e2e constrained generation (reference `constrained/` +
`test/srt/test_json_constrained.py` patterns)."""

import json
import re as pyre

import numpy as np
import pytest

from sglang_npu_tpu.constrained.json_schema import build_json_regex
from sglang_npu_tpu.constrained.regex_engine import LazyDFA
from sglang_npu_tpu.constrained.grammar_backend import GrammarBackend
from sglang_npu_tpu.tokenizer.byte_tokenizer import ByteTokenizer


@pytest.mark.parametrize(
    "pattern,accept,reject",
    [
        (r"abc", ["abc"], ["ab", "abcd", "xbc"]),
        (r"a*b+", ["b", "aab", "abbb"], ["a", "", "ba"]),
        (r"(ab|cd)*", ["", "ab", "abcd", "cdab"], ["a", "abc"]),
        (r"[a-c]{2,3}", ["ab", "abc", "ccc"], ["a", "abcd", "xd"]),
        (r"\d+\.\d{2}", ["3.14", "10.00"], ["3.1", ".14", "3,14"]),
        (r"yes|no", ["yes", "no"], ["maybe", "y"]),
        (r"[^x]+", ["abc", "yz"], ["", "axc"]),
        (r"a?b", ["b", "ab"], ["aab", "a"]),
        (r"(foo){2}", ["foofoo"], ["foo", "foofoofoo"]),
    ],
)
def test_regex_engine(pattern, accept, reject):
    dfa = LazyDFA(pattern)
    for s in accept:
        assert dfa.accepts(s.encode()), f"{pattern} should accept {s!r}"
    for s in reject:
        assert not dfa.accepts(s.encode()), f"{pattern} should reject {s!r}"


def test_regex_unicode():
    dfa = LazyDFA(r"héllo")
    assert dfa.accepts("héllo".encode())
    assert not dfa.accepts("hello".encode())


def test_json_schema_regex():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "ok": {"type": "boolean"},
        },
        "required": ["name", "age", "ok"],
    }
    pattern = build_json_regex(json.dumps(schema))
    dfa = LazyDFA(pattern)
    good = '{"name": "bob", "age": 42, "ok": true}'
    assert dfa.accepts(good.encode())
    assert not dfa.accepts(b'{"name": 3}')
    assert not dfa.accepts(b'{"age": 42, "name": "bob", "ok": true}')  # fixed order


def test_json_schema_enum_array():
    schema = {
        "type": "object",
        "properties": {
            "color": {"enum": ["red", "green"]},
            "nums": {"type": "array", "items": {"type": "integer"}},
        },
    }
    dfa = LazyDFA(build_json_regex(json.dumps(schema)))
    assert dfa.accepts(b'{"color": "red", "nums": [1, 2, 3]}')
    assert dfa.accepts(b'{"color": "green", "nums": []}')
    assert not dfa.accepts(b'{"color": "blue", "nums": []}')


def test_token_mask_with_byte_tokenizer():
    tok = ByteTokenizer()
    backend = GrammarBackend(tok, tok.vocab_size)
    g = backend.compile_sync("regex", r"ab+")
    mask = g.vocab_mask()

    def allowed(tid):
        return bool((mask[tid >> 5] >> (tid & 31)) & 1)

    assert allowed(ord("a"))
    assert not allowed(ord("b"))  # must start with 'a'
    assert not allowed(tok.eos_token_id)  # not accepting yet

    assert g.accept_token(ord("a"))
    assert g.accept_token(ord("b"))
    mask2 = g.vocab_mask()

    def allowed2(tid):
        return bool((mask2[tid >> 5] >> (tid & 31)) & 1)

    assert allowed2(ord("b"))
    assert allowed2(tok.eos_token_id)  # "ab" accepting
    assert not allowed2(ord("a"))


def test_e2e_constrained_generation(tmp_path_factory):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from sglang_npu_tpu.entrypoints.engine import Engine

    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=257,
    )
    torch.manual_seed(1)
    d = tmp_path_factory.mktemp("fsm_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(d, safe_serialization=True)
    # decode_steps=1 pins the host per-token mask path (the fused-window
    # device-FSM path is covered by tests/test_device_fsm.py; sampling
    # trajectories differ between the two RNG streams)
    e = Engine(
        model_path=str(d), dtype="float32", tokenizer_mode="byte",
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, decode_steps=1,
    )
    try:
        out = e.generate(
            "give me a number: ",
            {"max_new_tokens": 12, "temperature": 0.8, "regex": r"\d+\.\d{2}"},
        )
        text = out["text"]
        assert pyre.fullmatch(r"\d+\.\d{2}", text), f"got {text!r}"

        out2 = e.generate(
            "json: ",
            {
                "max_new_tokens": 40,
                "temperature": 0.7,
                "json_schema": json.dumps(
                    {"type": "object", "properties": {"a": {"type": "integer"}}}
                ),
            },
        )
        parsed = json.loads(out2["text"])
        assert isinstance(parsed, dict)
    finally:
        e.shutdown()


def test_json_string_values_allow_full_charset():
    """Regression: the engine mis-parsed STRING_RE's [^"\\\\\\x00-\\x1f]
    class (no \\xHH support), rejecting JSON strings containing uppercase
    letters, digits, or 'x'."""
    from sglang_npu_tpu.constrained.json_schema import schema_to_regex
    from sglang_npu_tpu.constrained.regex_engine import LazyDFA

    pat = schema_to_regex(
        {"type": "object", "properties": {"q": {"type": "string"}},
         "required": ["q"]}
    )
    dfa = LazyDFA(pat)
    assert dfa.accepts(b'{"q": "x"}')
    assert dfa.accepts(b'{"q": "Oslo 42 Xy"}')
    assert not dfa.accepts(b'{"q": "raw\x01ctrl"}')
