"""DBRX parity vs HF (fused clamped Wqkv, flat expert blobs, p-norm
renormalized routing)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from transformers.models.dbrx.configuration_dbrx import (
    DbrxAttentionConfig,
    DbrxFFNConfig,
)

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


def test_dbrx_matches_hf(tmp_path_factory):
    cfg = transformers.DbrxConfig(
        vocab_size=VOCAB, d_model=64, n_layers=3, n_heads=4,
        max_seq_len=256,
        attn_config=DbrxAttentionConfig(
            kv_n_heads=2, clip_qkv=6.0, attn_pdrop=0.0,
        ),
        ffn_config=DbrxFFNConfig(
            ffn_hidden_size=96, moe_num_experts=4, moe_top_k=2,
            moe_normalize_expert_weights=1.0,
        ),
        torch_dtype="float32", eos_token_id=2, pad_token_id=0,
        resid_pdrop=0.0, emb_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.DbrxForCausalLM(cfg)
    hf.eval()
    d = tmp_path_factory.mktemp("dbrx")
    hf.save_pretrained(d, safe_serialization=True)
    e = Engine(
        model_path=str(d), dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0,
    )
    try:
        rng = np.random.default_rng(12)
        for n in (5, 17):
            p = rng.integers(3, VOCAB, size=n).tolist()
            out = e.generate(
                input_ids=[p],
                sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                                 "ignore_eos": True},
            )
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([p]), max_new_tokens=6, do_sample=False
                )[0][n:].tolist()
            got = out[0]["output_ids"][: len(ref)]
            assert got == ref, (n, got, ref)
    finally:
        e.shutdown()
