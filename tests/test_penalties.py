"""Sampling penalty tests (reference `sampling/penaltylib/` semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sglang_npu_tpu.layers.sampler import (
    apply_penalties,
    build_penalty_counts,
    update_penalty_counts,
)
from sglang_npu_tpu.model_executor.forward_batch_info import SamplingDevice

V = 32


def mk_sampling(hist, is_out, freq=0.0, pres=0.0, rep=1.0, B=None):
    B = len(hist)
    return SamplingDevice(
        temperatures=jnp.ones((B,)),
        top_ks=jnp.full((B,), V, jnp.int32),
        top_ps=jnp.ones((B,)),
        min_ps=jnp.zeros((B,)),
        frequency_penalties=jnp.full((B,), freq, jnp.float32),
        presence_penalties=jnp.full((B,), pres, jnp.float32),
        repetition_penalties=jnp.full((B,), rep, jnp.float32),
        token_hist=jnp.asarray(hist, jnp.int32),
        hist_is_output=jnp.asarray(is_out, bool),
    )


def test_counts_from_history():
    hist = [[3, 3, 5, -1], [7, -1, -1, -1]]
    is_out = [[False, True, True, False], [False, False, False, False]]
    s = mk_sampling(hist, is_out)
    co, ca = build_penalty_counts(s, V)
    co, ca = np.asarray(co), np.asarray(ca)
    assert co[0, 3] == 1 and co[0, 5] == 1  # only output occurrences
    assert ca[0, 3] == 2 and ca[0, 5] == 1  # all occurrences
    assert co[1].sum() == 0 and ca[1, 7] == 1
    # padding (-1) contributed nothing
    assert ca.sum() == 4


def test_frequency_presence_penalty():
    hist = [[4, 4, 4, -1]]
    is_out = [[True, True, True, False]]
    s = mk_sampling(hist, is_out, freq=0.5, pres=0.25)
    co, ca = build_penalty_counts(s, V)
    logits = jnp.zeros((1, V))
    out = np.asarray(apply_penalties(logits, s, co, ca))
    assert abs(out[0, 4] - (-0.5 * 3 - 0.25)) < 1e-6
    assert out[0, 5] == 0.0


def test_repetition_penalty_sign():
    hist = [[2, 3, -1, -1]]
    is_out = [[False, True, False, False]]
    s = mk_sampling(hist, is_out, rep=2.0)
    co, ca = build_penalty_counts(s, V)
    logits = jnp.zeros((1, V)).at[0, 2].set(4.0).at[0, 3].set(-4.0).at[0, 9].set(4.0)
    out = np.asarray(apply_penalties(logits, s, co, ca))
    assert out[0, 2] == 2.0  # positive: divided
    assert out[0, 3] == -8.0  # negative: multiplied
    assert out[0, 9] == 4.0  # unseen: untouched


def test_update_counts_on_device_window():
    hist = [[1, -1], [2, -1]]
    is_out = [[True, False], [True, False]]
    s = mk_sampling(hist, is_out)
    co, ca = build_penalty_counts(s, V)
    toks = jnp.asarray([5, 2], jnp.int32)
    active = jnp.asarray([True, False])
    co2, ca2 = update_penalty_counts(co, ca, toks, active)
    co2 = np.asarray(co2)
    assert co2[0, 5] == 1
    assert co2[1, 2] == 1  # still just the history count: inactive row not updated


def test_engine_penalty_reduces_repeats(tmp_path_factory):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from sglang_npu_tpu.entrypoints.engine import Engine

    cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(3)
    d = tmp_path_factory.mktemp("pen_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla", random_seed=0,
    )
    try:
        base = e.generate(
            input_ids=[5, 6, 7],
            sampling_params={"max_new_tokens": 16, "temperature": 0.0, "ignore_eos": True},
        )["output_ids"]
        pen = e.generate(
            input_ids=[5, 6, 7],
            sampling_params={
                "max_new_tokens": 16, "temperature": 0.0, "ignore_eos": True,
                "frequency_penalty": 1.9, "repetition_penalty": 1.5,
            },
        )["output_ids"]
        # greedy tiny models loop hard; penalties must break the loop
        def max_count(ids):
            return max(ids.count(t) for t in set(ids))
        assert max_count(pen) < max_count(base) or len(set(pen)) > len(set(base))
    finally:
        e.shutdown()
