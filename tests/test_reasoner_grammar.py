"""Reasoner grammar wrapper: constraints activate only after </think>
(reference constrained/reasoner_grammar_backend.py)."""

import numpy as np
import pytest

from sglang_npu_tpu.constrained.grammar_backend import GrammarBackend
from sglang_npu_tpu.constrained.reasoner_grammar import ReasonerGrammar


class ByteVocabStub:
    """Tiny vocab: token id i = byte chr(i)."""

    eos_token_id = 0

    def token_bytes(self, tid):
        return bytes([tid])

    def compute_mask(self, dfa, state):
        mask = np.zeros(8, dtype=np.uint32)  # 256 tokens
        for b in dfa.allowed_bytes(state):
            mask[b >> 5] |= np.uint32(1 << (b & 31))
        if dfa.is_accepting(state):
            mask[0] |= np.uint32(1)  # EOS
        return mask


def make_inner(pattern="[ab]{2}"):
    from sglang_npu_tpu.constrained.grammar_backend import FsmGrammar
    from sglang_npu_tpu.constrained.regex_engine import LazyDFA

    return FsmGrammar(LazyDFA(pattern), ByteVocabStub())


END = 200  # arbitrary think-end token id


def test_inactive_passthrough_and_activation():
    g = ReasonerGrammar(make_inner(), END)
    assert g.is_inactive and not g.finished
    assert g.device is None
    # free thinking: any tokens accepted, all-ones mask
    for t in (5, 99, 31):
        assert g.accept_token(t)
        assert not g.just_activated
    assert (g.vocab_mask() == 0xFFFFFFFF).all()
    assert g.forced_continuation() == b""
    # activation
    assert g.accept_token(END)
    assert g.just_activated and g.active
    # now the inner FSM rules: 'a' ok, 'x' dead
    assert g.accept_token(ord("a"))
    assert not g.accept_token(ord("x"))
    assert g.error


def test_constrained_after_activation_finishes():
    g = ReasonerGrammar(make_inner(), END)
    g.accept_token(7)
    g.accept_token(END)
    assert g.accept_token(ord("a"))
    assert g.accept_token(ord("b"))
    assert g.is_accepting()
    mask = g.vocab_mask()
    assert mask[0] & 1  # EOS allowed at accept state


def test_rollback_across_activation_boundary():
    g = ReasonerGrammar(make_inner(), END)
    g.accept_token(3)
    g.accept_token(END)
    g.accept_token(ord("a"))
    g.rollback(2)  # undo 'a' and the activation
    assert g.is_inactive
    # re-activate and run again
    g.accept_token(END)
    assert g.active
    assert g.accept_token(ord("b"))


def test_reset_clears_activation():
    g = ReasonerGrammar(make_inner(), END)
    g.accept_token(END)
    assert g.active
    g.reset()
    assert g.is_inactive


def test_think_end_token_id_helper():
    from sglang_npu_tpu.constrained.reasoner_grammar import think_end_token_id

    class OneTok:
        def encode(self, s, add_special_tokens=False):
            return [42]

    class ManyTok:
        def encode(self, s, add_special_tokens=False):
            return [1, 2, 3]

    assert think_end_token_id(OneTok()) == 42
    assert think_end_token_id(ManyTok()) is None
    assert think_end_token_id(None) is None


@pytest.fixture(scope="module")
def tiny_engine(tmp_path_factory):
    import torch
    import transformers

    import sglang_npu_tpu as sgl

    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, eos_token_id=2, torch_dtype="float32",
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("reasoner")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    e = sgl.Engine(
        model_path=str(d), dtype="float32", page_size=4,
        max_total_tokens=2048, attention_backend="xla",
        tokenizer_mode="byte", random_seed=0,
        reasoning_parser="deepseek-r1",
    )
    yield e
    e.shutdown()


def test_reasoner_e2e_grammar_waits_for_think_end(tiny_engine, monkeypatch):
    """With --reasoning-parser, a regex constraint applies only after the
    think-end token: the first (free) token matches the unconstrained
    greedy run, then the output flips to the constrained alphabet."""
    e = tiny_engine
    prompt = "Question:"
    # probe: first unconstrained greedy token
    free = e.generate(
        prompt, {"max_new_tokens": 1, "temperature": 0.0, "ignore_eos": True}
    )["output_ids"]
    t0 = free[0]

    import sglang_npu_tpu.constrained.reasoner_grammar as rg

    monkeypatch.setattr(rg, "think_end_token_id", lambda tok: t0)

    out = e.generate(
        prompt,
        {
            "max_new_tokens": 16,
            "temperature": 0.0,
            "regex": "[ab]{4}",
        },
    )
    ids = out["output_ids"]
    # token 0 was free thinking (= the unconstrained greedy token, which
    # also acts as the patched think-end); the rest is constrained to
    # exactly [ab]{4}, then the grammar finishes the request
    assert ids[0] == t0
    # 4 constrained tokens (+ optionally the finishing EOS id)
    assert len(ids) in (5, 6), ids
    assert all(t in (ord("a"), ord("b")) for t in ids[1:5]), ids
