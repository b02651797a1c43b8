"""Cross-host SPMD: two OS processes (4 virtual CPU devices each) join a
jax.distributed runtime; tp=8 spans both "hosts" in one global mesh, with
node 0's scheduler broadcasting lockstep inputs to the worker replica
(reference: multi-node TP via `parallel_state.py:1232,1287`; here the
TPU-native jax.distributed + SpmdStepChannel redesign).

Greedy outputs must exactly match single-process HF generation.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "spmd_child.py")
VOCAB = 128


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(cfg)
    d = tmp_path_factory.mktemp("spmd_model")
    m.save_pretrained(d, safe_serialization=True)
    return str(d), m


def test_two_process_tp8_matches_hf(model_dir, tmp_path):
    path, hf = model_dir
    port = _free_port()
    out_json = str(tmp_path / "out.json")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(rank), "2", str(port), path, out_json],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=REPO,
        )
        for rank in (1, 0)
    ]
    try:
        outs = [p.communicate(timeout=420)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        outs = [p.communicate()[0] for p in procs]
        pytest.fail("SPMD children timed out:\n" + b"\n====\n".join(outs).decode(errors="replace")[-4000:])
    rcs = [p.returncode for p in procs]
    logs = b"\n====\n".join(outs).decode(errors="replace")
    assert all(rc == 0 for rc in rcs), f"child rcs={rcs}\n{logs[-4000:]}"
    with open(out_json) as f:
        got = json.load(f)

    prompts = [  # keep in sync with tests/spmd_child.py PROMPTS
        list(range(3, 8)),
        [5, 9, 23, 54, 11, 88, 41, 67, 100, 13, 29, 31, 7, 90, 61, 77, 19, 3],
        [101, 4, 55, 66],
    ]
    for p, o in zip(prompts, got):
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([p]), max_new_tokens=6, do_sample=False
            )[0][len(p):].tolist()
        assert o == ref, f"{o} != {ref}\n{logs[-2000:]}"
