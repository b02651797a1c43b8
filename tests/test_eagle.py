"""EAGLE speculative decoding: losslessness and acceptance.

Reference behaviors: `speculative/eagle_worker.py` (draft/verify/extend),
`build_eagle_tree.py` (tree verify), `test_eagle_infer.py` (lossless
greedy output).

Fixtures:
  * an "oracle" draft — fc passes the embedding straight through and the
    single decoder layer COPIES the 1-layer target's weights (target's
    final_norm set to ones so logits argmax is scale-invariant): the
    draft then predicts the target exactly, so every draft token must be
    accepted (mean accept length == steps+1).
  * a random draft — near-zero acceptance, but output must STILL match
    the target's greedy decoding exactly (lossless property).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from safetensors.numpy import save_file

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128
D = 64


def mk_target(d, seed=0, layers=1):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=D, intermediate_size=128,
        num_hidden_layers=layers, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(seed)
    m = transformers.LlamaForCausalLM(cfg)
    with torch.no_grad():
        m.model.norm.weight.fill_(1.0)  # scale-invariant final norm
    m.save_pretrained(d, safe_serialization=True)
    return m


def mk_eagle_draft(d, target_dir, oracle: bool, seed=1):
    """Write an EAGLE head checkpoint (fc + layers.0.*) directory."""
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": VOCAB,
        "hidden_size": D,
        "intermediate_size": 128,
        "num_hidden_layers": 1,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "max_position_embeddings": 512,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "torch_dtype": "float32",
    }
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    rng = np.random.default_rng(seed)
    if oracle:
        fc = np.concatenate(
            [np.eye(D, dtype=np.float32), np.zeros((D, D), np.float32)],
            axis=1,
        )  # out x in: select the embedding half
        from safetensors import safe_open
        import glob

        src = {}
        for fp in glob.glob(os.path.join(target_dir, "*.safetensors")):
            with safe_open(fp, framework="np") as f:
                for n in f.keys():
                    src[n] = f.get_tensor(n)
        tensors = {"fc.weight": fc}
        for suffix in (
            "input_layernorm.weight", "post_attention_layernorm.weight",
            "self_attn.q_proj.weight", "self_attn.k_proj.weight",
            "self_attn.v_proj.weight", "self_attn.o_proj.weight",
            "mlp.gate_proj.weight", "mlp.up_proj.weight",
            "mlp.down_proj.weight",
        ):
            tensors[f"layers.0.{suffix}"] = src[
                f"model.layers.0.{suffix}"
            ]
    else:
        def r(*shape):
            return (rng.standard_normal(shape) * 0.02).astype(np.float32)

        tensors = {
            "fc.weight": r(D, 2 * D),
            "layers.0.input_layernorm.weight": np.ones(D, np.float32),
            "layers.0.post_attention_layernorm.weight": np.ones(D, np.float32),
            "layers.0.self_attn.q_proj.weight": r(D, D),
            "layers.0.self_attn.k_proj.weight": r(D // 2, D),
            "layers.0.self_attn.v_proj.weight": r(D // 2, D),
            "layers.0.self_attn.o_proj.weight": r(D, D),
            "layers.0.mlp.gate_proj.weight": r(128, D),
            "layers.0.mlp.up_proj.weight": r(128, D),
            "layers.0.mlp.down_proj.weight": r(D, 128),
        }
    save_file(tensors, os.path.join(d, "model.safetensors"))


def make_engine(target_dir, draft_dir, **kw):
    return Engine(
        model_path=str(target_dir), dtype="float32",
        skip_tokenizer_init=True, page_size=4, max_total_tokens=8192,
        attention_backend="xla", random_seed=0,
        speculative_algorithm="EAGLE",
        speculative_draft_model_path=str(draft_dir),
        speculative_num_steps=3,
        speculative_eagle_topk=2,
        **kw,
    )


@pytest.fixture(scope="module")
def oracle_setup(tmp_path_factory):
    dt = tmp_path_factory.mktemp("eagle_target")
    dd = tmp_path_factory.mktemp("eagle_draft")
    target = mk_target(dt, seed=0, layers=1)
    mk_eagle_draft(dd, str(dt), oracle=True)
    e = make_engine(dt, dd)
    yield e, target
    e.shutdown()


def test_eagle_lossless_and_full_acceptance(oracle_setup):
    engine, target = oracle_setup
    rng = np.random.default_rng(0)
    for n in (5, 17, 30):
        prompt = rng.integers(3, VOCAB, size=n).tolist()
        out = engine.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 16, "temperature": 0.0,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            ref = target.generate(
                torch.tensor([prompt]), max_new_tokens=16, do_sample=False
            )[0][n:].tolist()
        assert out["output_ids"] == ref, (n, out["output_ids"], ref)
    # oracle draft: every draft token accepted -> few forward rounds
    st = engine.get_internal_state()
    assert st["forward_ct"] > 0


def test_eagle_acceptance_stats(oracle_setup):
    engine, _ = oracle_setup
    prompt = list(np.random.default_rng(7).integers(3, VOCAB, size=12))
    out = engine.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 15, "temperature": 0.0,
                         "ignore_eos": True},
    )
    accepted = out["meta_info"].get("spec_accepted_tokens", 0)
    # 15 tokens in ~4 rounds of (3 accepted + 1 bonus): >= 2 mean accept
    assert accepted >= len(out["output_ids"]) // 2, out["meta_info"]


def test_eagle_random_draft_still_lossless(tmp_path_factory):
    dt = tmp_path_factory.mktemp("eagle_t2")
    dd = tmp_path_factory.mktemp("eagle_d2")
    target = mk_target(dt, seed=3, layers=2)
    mk_eagle_draft(dd, str(dt), oracle=False)
    e = make_engine(dt, dd)
    try:
        rng = np.random.default_rng(1)
        for n in (6, 23):
            prompt = rng.integers(3, VOCAB, size=n).tolist()
            out = e.generate(
                input_ids=prompt,
                sampling_params={"max_new_tokens": 10, "temperature": 0.0,
                                 "ignore_eos": True},
            )
            with torch.no_grad():
                ref = target.generate(
                    torch.tensor([prompt]), max_new_tokens=10, do_sample=False
                )[0][n:].tolist()
            assert out["output_ids"] == ref, (n, out["output_ids"], ref)
    finally:
        e.shutdown()


def test_eagle_chunked_prefill_and_prefix(oracle_setup):
    engine, target = oracle_setup
    rng = np.random.default_rng(9)
    prompt = rng.integers(3, VOCAB, size=70).tolist()
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
    out1 = engine.generate(input_ids=prompt, sampling_params=sp)
    with torch.no_grad():
        ref = target.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False
        )[0][70:].tolist()
    assert out1["output_ids"] == ref
    # radix prefix hit path
    out2 = engine.generate(input_ids=prompt, sampling_params=sp)
    assert out2["output_ids"] == ref


def test_tree_walk_accepts_nonrank0_branches():
    """The full top-k tree (reference build_eagle_tree.py) keeps drafting
    below NON-rank-0 nodes: a target preferring the #2 candidate still
    accepts multiple tokens, where the chain-with-siblings topology (all
    parents rank 0) must stop after one."""
    import numpy as np

    from sglang_npu_tpu.model_executor.eagle_runner import tree_accept_walk

    S, K = 3, 2
    # tree: depth0 cands [10, 20]; depth1 under parent-rank1: [21, 22];
    # depth2 under the depth-1 rank-0 node (which is 21's): [30, 31]
    cand = np.array([[10, 20], [21, 99], [30, 31]])
    par = np.array([[0, 0], [1, 0], [0, 0]])
    preds = np.zeros(1 + S * K, np.int32)
    preds[0] = 20       # root predicts the #2 candidate
    preds[2] = 21       # node (0, rank1) predicts its child 21
    preds[3] = 31       # node (1, rank0)=21 predicts 31
    accepted, last = tree_accept_walk(cand, par, preds, S, K)
    assert [t for t, _ in accepted] == [20, 21, 31]
    assert last == 1 + 2 * K + 1

    # chain topology (par all zero): same preds accept ONLY the sibling
    par_chain = np.zeros((S, K), np.int32)
    accepted_c, _ = tree_accept_walk(cand, par_chain, preds, S, K)
    assert [t for t, _ in accepted_c] == [20]
