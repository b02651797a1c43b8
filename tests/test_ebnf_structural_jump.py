"""EBNF grammars, structural tags, and jump-forward decoding.

Reference behaviors: `constrained/xgrammar_backend.py` (`dispatch_ebnf`,
`dispatch_structural_tag`) and `constrained/outlines_jump_forward.py`
(forced-continuation jumping).  Here: EBNF compiles to the byte-level
regex FSM by bounded inline expansion (`constrained/ebnf.py`), structural
tags run as a composite free-text/DFA grammar
(`constrained/structural_tag.py`), and the scheduler replaces forced
decode steps with one KV-writing extend (`scheduler._try_jump_forward`).
"""

import json
import re as pyre

import pytest

from sglang_npu_tpu.constrained.ebnf import ebnf_to_regex
from sglang_npu_tpu.constrained.grammar_backend import GrammarBackend
from sglang_npu_tpu.constrained.regex_engine import LazyDFA
from sglang_npu_tpu.tokenizer.byte_tokenizer import ByteTokenizer


# ----------------------------------------------------------------------
# EBNF -> regex
# ----------------------------------------------------------------------
def test_ebnf_basics():
    g = r'''
    root ::= "yes" | "no" | maybe
    maybe ::= "maybe " [a-z]+
    '''
    d = LazyDFA(ebnf_to_regex(g))
    assert d.accepts(b"yes") and d.accepts(b"no") and d.accepts(b"maybe abc")
    assert not d.accepts(b"nope")


def test_ebnf_recursion_bounded():
    g = r'''
    root ::= expr
    expr ::= term (("+" | "-") term)*
    term ::= num | "(" expr ")"
    num  ::= [0-9]+
    '''
    d = LazyDFA(ebnf_to_regex(g))
    assert d.accepts(b"1+2-3")
    assert d.accepts(b"(1+(2-3))+4")
    assert not d.accepts(b"1++2")


def test_ebnf_json_like_grammar():
    g = r'''
    root   ::= object
    object ::= "{" ( string ":" value ("," string ":" value)* )? "}"
    value  ::= object | array | string | number
    array  ::= "[" ( value ("," value)* )? "]"
    string ::= "\"" [a-z]* "\""
    number ::= "-"? [0-9]+
    '''
    d = LazyDFA(ebnf_to_regex(g))
    assert d.accepts(b'{"a":1,"b":{"c":[-2,{"d":3}]}}')
    assert not d.accepts(b'{"a":}')


def test_ebnf_unbounded_recursion_rejected():
    with pytest.raises(ValueError, match="recursive"):
        ebnf_to_regex('root ::= "(" root ")"')


def test_ebnf_repetitions_comments_escapes():
    g = 'root ::= "ab" [0-9]{2,4} "\\n"?  # trailing newline optional'
    d = LazyDFA(ebnf_to_regex(g))
    assert d.accepts(b"ab12") and d.accepts(b"ab1234\n")
    assert not d.accepts(b"ab1")


def test_ebnf_through_backend():
    tok = ByteTokenizer()
    backend = GrammarBackend(tok, tok.vocab_size)
    g = backend.compile_sync("ebnf", 'root ::= "ok" [0-9]')
    assert g.accept_token(ord("o"))
    assert g.accept_token(ord("k"))
    mask = g.vocab_mask()
    assert bool((mask[ord("5") >> 5] >> (ord("5") & 31)) & 1)
    assert not bool((mask[ord("a") >> 5] >> (ord("a") & 31)) & 1)


# ----------------------------------------------------------------------
# structural tags
# ----------------------------------------------------------------------
def _allowed(mask, tid):
    return bool((mask[tid >> 5] >> (tid & 31)) & 1)


def test_structural_tag_free_then_constrained():
    tok = ByteTokenizer()
    backend = GrammarBackend(tok, tok.vocab_size)
    spec = json.dumps({
        "structures": [{
            "begin": "<f=get>",
            "schema": {"type": "object",
                       "properties": {"x": {"type": "integer"}}},
            "end": "</f>",
        }],
        "triggers": ["<f="],
    })
    g = backend.compile_sync("structural_tag", spec)
    # free mode: everything allowed
    m = g.vocab_mask()
    assert _allowed(m, ord("z")) and _allowed(m, tok.eos_token_id)
    for b in b"hello <f=":
        assert g.accept_token(b)
    # trigger seen: now constrained to the structure continuation "get>"
    m = g.vocab_mask()
    assert _allowed(m, ord("g"))
    assert not _allowed(m, ord("z"))
    assert not _allowed(m, tok.eos_token_id)
    for b in b'get>{"x": 7}</f>':
        assert g.accept_token(b), chr(b)
    # structure complete: free mode resumes
    m = g.vocab_mask()
    assert _allowed(m, ord("z")) and _allowed(m, tok.eos_token_id)
    # a second structure can start again
    for b in b" and <f=get>":
        assert g.accept_token(b)
    assert not _allowed(g.vocab_mask(), ord("z"))


def test_structural_tag_rollback():
    tok = ByteTokenizer()
    backend = GrammarBackend(tok, tok.vocab_size)
    spec = json.dumps({
        "structures": [{"begin": "<t>", "schema": {}, "end": "</t>"}],
        "triggers": ["<t>"],
    })
    g = backend.compile_sync("structural_tag", spec)
    for b in b"x<t>":
        g.accept_token(b)
    assert g.mode == "struct"
    g.rollback(1)  # undo the '>' -> back to free
    assert g.mode == "free"


# ----------------------------------------------------------------------
# jump-forward e2e
# ----------------------------------------------------------------------
def test_jump_forward_e2e(tmp_path_factory):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from sglang_npu_tpu.entrypoints.engine import Engine

    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=257,
    )
    torch.manual_seed(1)
    d = tmp_path_factory.mktemp("jump_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    # Long forced middle section: with the byte tokenizer each forced char
    # is a decode step without jump-forward, a single extend with it.
    rx = r"[ab]THE-FORCED-MIDDLE-SECTION[cd]E"
    sp = {"max_new_tokens": 60, "temperature": 0.0, "regex": rx}
    common = dict(
        model_path=str(d), dtype="float32", tokenizer_mode="byte",
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, decode_steps=1,
    )
    e = Engine(**common)
    try:
        out = e.generate("go: ", sp)
        assert pyre.fullmatch(rx, out["text"]), out["text"]
        jumped = e.scheduler.num_jump_forward_tokens
        assert jumped >= 20, jumped  # the forced section was jumped
    finally:
        e.shutdown()

    e2 = Engine(**common, disable_jump_forward=True)
    try:
        out2 = e2.generate("go: ", sp)
        assert e2.scheduler.num_jump_forward_tokens == 0
        # greedy: identical output with and without jumping
        assert out2["text"] == out["text"]
    finally:
        e2.shutdown()


def test_jump_forward_with_batch_and_streaming(tmp_path_factory):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from sglang_npu_tpu.entrypoints.engine import Engine

    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=257,
    )
    torch.manual_seed(2)
    d = tmp_path_factory.mktemp("jump_model2")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    e = Engine(
        model_path=str(d), dtype="float32", tokenizer_mode="byte",
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, decode_steps=1,
    )
    try:
        rx = r'\{"tool": "[ab]+", "id": [0-9]\}'
        sp = {"max_new_tokens": 48, "temperature": 0.7, "regex": rx}
        outs = e.generate(["p1: ", "p2: ", "p3: "], sp)
        for o in outs:
            assert pyre.fullmatch(rx, o["text"]), o["text"]
        assert e.scheduler.num_jump_forward_tokens > 0
        # streaming emits the jumped tokens too
        chunks = list(e.generate("s: ", sp, stream=True))
        text = chunks[-1]["text"]
        assert pyre.fullmatch(rx, text), text
    finally:
        e.shutdown()
