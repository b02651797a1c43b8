"""On-device grammar FSM: dense DFA tables must make the same decisions as
the host byte-FSM bit for bit, and constrained decoding must keep the fused
K-step decode window (round-1 review: grammar collapsed the window to K=1)."""

import json
import re as pyre

import numpy as np
import pytest

from sglang_npu_tpu.constrained.device_fsm import (
    build_device_grammar,
    stack_grammars,
    token_byte_arrays,
)
from sglang_npu_tpu.constrained.grammar_backend import GrammarBackend
from sglang_npu_tpu.tokenizer.byte_tokenizer import ByteTokenizer


def _backend():
    tok = ByteTokenizer()
    return tok, GrammarBackend(tok, tok.vocab_size)


def test_device_tables_match_host_masks():
    tok, backend = _backend()
    g = backend.compile_sync("regex", r"\d+\.\d{2}")
    assert g.device is not None
    dg = g.device
    # every reachable state's device mask row == host-computed mask
    for state, row in dg.state_index.items():
        host_mask = g.vocab.compute_mask(g.dfa, state)
        if host_mask.any():
            np.testing.assert_array_equal(dg.mask_table[row], host_mask)

    # random walks: device byte-table transitions == host FSM transitions
    tb, tl = token_byte_arrays(g.vocab)
    rng = np.random.default_rng(0)
    for _ in range(20):
        g2 = backend.compile_sync("regex", r"\d+\.\d{2}")
        for _step in range(6):
            mask = g2.vocab_mask()
            allowed = [
                t
                for t in range(tok.vocab_size)
                if (mask[t >> 5] >> (t & 31)) & 1 and t != tok.eos_token_id
            ]
            if not allowed:
                break
            t = int(rng.choice(allowed))
            dev_s = dg.state_index[g2.state]
            # device-side transition: walk token bytes through byte_table
            s = dev_s
            for i in range(int(tl[t])):
                s = int(dg.byte_table[s, int(tb[t, i])])
                assert s >= 0, "allowed token hit dead state on device"
            ok = g2.accept_token(t)
            assert ok
            assert dg.state_index[g2.state] == s


def test_stacked_layout_fin_dead_rows():
    tok, backend = _backend()
    g1 = backend.compile_sync("regex", r"ab+")
    g2 = backend.compile_sync("regex", r"yes|no")
    nwords = (tok.vocab_size + 31) // 32
    bt, mt, FIN, DEAD = stack_grammars(
        [g1.device, g2.device], nwords, tok.eos_token_id
    )
    assert bt.shape[0] == 2 and bt.shape[2] == 256
    # FIN: all-ones mask, self-loop on every byte
    assert np.all(mt[:, FIN] == np.uint32(0xFFFFFFFF))
    assert np.all(bt[:, FIN] == FIN)
    # DEAD: self-loop, eos-only mask
    assert np.all(bt[:, DEAD] == DEAD)
    eos = tok.eos_token_id
    assert mt[0, DEAD, eos >> 5] == np.uint32(1 << (eos & 31))
    # real dead transitions remapped to the DEAD row
    assert np.all(bt[bt >= 0] <= DEAD)


def _tiny_engine(tmp_path_factory, **kw):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from sglang_npu_tpu.entrypoints.engine import Engine

    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=257,
    )
    torch.manual_seed(1)
    d = tmp_path_factory.mktemp("dev_fsm_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    return Engine(
        model_path=str(d), dtype="float32", tokenizer_mode="byte",
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, **kw,
    )


def test_fused_window_constrained_equals_single_step(tmp_path_factory):
    """Greedy constrained output must be identical whether the grammar
    advances on device inside the fused K=8 window or on host at K=1."""
    sp = {
        "max_new_tokens": 16,
        "temperature": 0.0,
        "regex": r"\d+\.\d{2}",
    }
    sp_json = {
        "max_new_tokens": 48,
        "temperature": 0.0,
        "json_schema": json.dumps(
            {
                "type": "object",
                "properties": {
                    "a": {"type": "integer"},
                    "b": {"type": "boolean"},
                },
                "required": ["a", "b"],
            }
        ),
    }
    # finite language: greedy MUST terminate via the EOS-forced mask
    sp_yes = {"max_new_tokens": 8, "temperature": 0.0, "regex": r"yes|no"}
    e8 = _tiny_engine(tmp_path_factory, decode_steps=8)
    try:
        o8 = e8.generate("number: ", sp)
        j8 = e8.generate("json: ", sp_json)
        y8 = e8.generate("pick: ", sp_yes)
        # the fused path really ran with device FSM tables
        runner = e8.scheduler.runner
        assert getattr(runner, "_fsm_stack_cache", None), (
            "device FSM tables were never used"
        )
        # every prefix the grammar emitted is language-valid (the random
        # tiny model may legally spend the whole budget inside `\d+`)
        assert pyre.fullmatch(r"\d*|\d+\.\d{0,2}", o8["text"]), o8["text"]
        assert pyre.fullmatch(r"yes|no", y8["text"]), y8["text"]
    finally:
        e8.shutdown()

    e1 = _tiny_engine(tmp_path_factory, decode_steps=1)
    try:
        o1 = e1.generate("number: ", sp)
        j1 = e1.generate("json: ", sp_json)
        y1 = e1.generate("pick: ", sp_yes)
        assert not getattr(e1.scheduler.runner, "_fsm_stack_cache", None)
    finally:
        e1.shutdown()
    assert o8["output_ids"] == o1["output_ids"]
    assert j8["output_ids"] == j1["output_ids"]
    assert y8["output_ids"] == y1["output_ids"]


def test_mixed_batch_grammar_and_free(tmp_path_factory):
    """A batch mixing grammar and free requests keeps the fused window:
    free requests ride the FIN row and are unaffected by the masks."""
    e = _tiny_engine(tmp_path_factory, decode_steps=8)
    try:
        free_sp = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}
        ref = e.generate("tell me something", free_sp)
        outs = e.generate(
            ["tell me something", "number: "],
            [free_sp, {"max_new_tokens": 12, "temperature": 0.0,
                       "regex": r"\d+\.\d{2}"}],
        )
        assert outs[0]["output_ids"] == ref["output_ids"]
        assert pyre.fullmatch(r"\d*|\d+\.\d{0,2}", outs[1]["text"]), (
            outs[1]["text"]
        )
    finally:
        e.shutdown()


def test_native_mask_matches_python():
    """csrc/token_mask.cpp projection is bit-identical to the Python
    per-state trie walk (and device tables use it when g++ exists)."""
    import numpy as np

    from sglang_npu_tpu.constrained import native_mask
    from sglang_npu_tpu.constrained.device_fsm import build_device_grammar
    from sglang_npu_tpu.constrained.regex_engine import LazyDFA
    from sglang_npu_tpu.constrained.token_vocab import TokenVocab
    from sglang_npu_tpu.tokenizer.byte_tokenizer import ByteTokenizer

    if native_mask.load() is None:
        pytest.skip("no C++ toolchain")
    tok = ByteTokenizer()
    vocab = TokenVocab.get(tok, tok.vocab_size)
    dfa = LazyDFA(r'\{"k": "[a-z]+", "n": -?[0-9]{1,4}\}')
    g = build_device_grammar(dfa, vocab)
    ref = np.zeros_like(g.mask_table)
    for s, j in g.state_index.items():
        ref[j] = vocab.compute_mask(dfa, s)
    eos = vocab.eos_token_id
    dead = ~ref.any(axis=1)
    ref[dead, eos >> 5] |= np.uint32(1 << (eos & 31))
    assert (g.mask_table == ref).all()


def test_constrained_throughput_ratio(tmp_path_factory):
    """Structured decode must stay within striking distance of free decode
    (round-1 weakness: grammar collapsed the fused window to K=1 host
    masking; the device FSM + jump-forward keep K>1).  CPU timing is
    noisy, so the floor is deliberately loose — it catches a collapse
    back to per-token host work, not small regressions."""
    import time

    import numpy as np

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from sglang_npu_tpu.entrypoints.engine import Engine

    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=512, torch_dtype="float32", eos_token_id=257,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("fsm_tput")
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    e = Engine(
        model_path=str(d), dtype="float32", tokenizer_mode="byte",
        page_size=4, max_total_tokens=8192, attention_backend="xla",
        random_seed=0,
    )
    try:
        prompts = [f"row {i}: " for i in range(8)]
        free_sp = {"max_new_tokens": 48, "temperature": 0.8,
                   "ignore_eos": True}
        json_sp = dict(free_sp)
        json_sp["regex"] = r'\{"k": "[a-z]+", "v": [0-9]+\}' + r"[a-z ]*"

        def run(sp):
            # warmup compiles outside the timed region
            e.generate(prompts[:1], dict(sp))
            e.flush_cache()
            t0 = time.time()
            outs = e.generate(prompts, sp)
            dt = time.time() - t0
            total = sum(len(o["output_ids"]) for o in outs)
            e.flush_cache()
            return total / dt

        free = run(free_sp)
        constrained = run(json_sp)
        ratio = constrained / free
        assert ratio >= 0.25, f"constrained collapse: {ratio:.2f}x of free"
    finally:
        e.shutdown()
