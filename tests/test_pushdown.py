"""Pushdown grammar machine: recursive JSON schemas (reference xgrammar
context-free semantics) that the round-2 regular-language compiler
rejected must now compile and constrain decoding."""

import json

import numpy as np
import pytest

from sglang_npu_tpu.constrained.pushdown import (
    PushdownMachine,
    build_json_pushdown,
    schema_needs_pushdown,
)

RECURSIVE_TREE = {
    "type": "object",
    "properties": {
        "value": {"type": "integer"},
        "children": {"type": "array", "items": {"$ref": "#"}},
    },
    "required": ["value", "children"],
}

RECURSIVE_DEFS = {
    "$defs": {
        "node": {
            "type": "object",
            "properties": {
                "name": {"type": "string"},
                "next": {
                    "anyOf": [{"$ref": "#/$defs/node"}, {"type": "null"}]
                },
            },
            "required": ["name", "next"],
        }
    },
    "$ref": "#/$defs/node",
}


def _accepts(m: PushdownMachine, text: str) -> bool:
    s = m.start
    for b in text.encode():
        s = m.step(s, b)
        if m.is_dead(s):
            return False
    return m.is_accepting(s)


def test_recursive_self_ref_accepts_nested():
    m = build_json_pushdown(json.dumps(RECURSIVE_TREE))
    good = {
        "value": 1,
        "children": [
            {"value": 2, "children": []},
            {"value": 3, "children": [{"value": 4, "children": []}]},
        ],
    }
    assert _accepts(m, json.dumps(good, separators=(",", ":")))
    assert _accepts(m, json.dumps(good))  # with spaces
    # wrong shapes rejected
    assert not _accepts(m, '{"value":1}')
    assert not _accepts(m, '{"value":1,"children":[{"value":"x","children":[]}]}')
    assert not _accepts(m, '{"value":1,"children":[')


def test_recursive_defs_linked_list():
    m = build_json_pushdown(json.dumps(RECURSIVE_DEFS))
    good = {"name": "a", "next": {"name": "b", "next": {"name": "c", "next": None}}}
    assert _accepts(m, json.dumps(good, separators=(",", ":")))
    assert not _accepts(m, '{"name":"a","next":{"name":"b"}}')


def test_deep_schema_beyond_regex_cap():
    # 12 levels of nesting: the regex builder caps at 8 and raised in r2
    schema: dict = {"type": "integer"}
    for i in range(12):
        schema = {
            "type": "object",
            "properties": {f"k{i}": schema},
            "required": [f"k{i}"],
        }
    s = json.dumps(schema)
    assert schema_needs_pushdown(s)
    m = build_json_pushdown(s)
    doc: object = 7
    for i in range(12):
        doc = {f"k{i}": doc}
    assert _accepts(m, json.dumps(doc, separators=(",", ":")))


def test_forced_path_and_masks():
    m = build_json_pushdown(json.dumps(RECURSIVE_TREE))
    # the schema forces the opening brace (whitespace after it makes the
    # next byte ambiguous, ending the forced run)
    assert m.forced_path(m.start, 64).startswith(b"{")
    # past the opening quote the key bytes are forced
    s = m.start
    for b in b'{"':
        s = m.step(s, b)
    assert m.forced_path(s, 64).startswith(b"value")


def test_engine_end_to_end_recursive_schema(tmp_path_factory):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from sglang_npu_tpu.entrypoints.engine import Engine

    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("pd_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    e = Engine(
        model_path=str(d), dtype="float32", page_size=4,
        max_total_tokens=4096, attention_backend="xla",
        tokenizer_mode="byte", random_seed=0, grammar_backend="fsm",
    )
    try:
        out = e.generate(
            "data: ",
            {
                "max_new_tokens": 80,
                "temperature": 0.0,
                "json_schema": json.dumps(RECURSIVE_TREE),
            },
        )
        m = build_json_pushdown(json.dumps(RECURSIVE_TREE))
        text = out["text"]
        # every emitted prefix is language-valid; a finished generation
        # must parse under the recursive schema
        s = m.start
        ok = True
        for b in text.encode():
            s = m.step(s, b)
            if m.is_dead(s):
                ok = False
                break
        assert ok, text
        if out["meta_info"]["finish_reason"]["type"] == "stop":
            doc = json.loads(text)
            assert isinstance(doc["children"], list)
    finally:
        e.shutdown()
