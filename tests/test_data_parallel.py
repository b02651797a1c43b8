"""Data-parallel serving: in-process DP replicas + ZMQ multi-host workers.

Reference behaviors: `managers/data_parallel_controller.py` (dispatch
policies, replica topology) and the multi-node ZMQ wiring
(`entrypoints/engine.py:674-821`).
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.entrypoints.engine import Engine

VOCAB = 128


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(cfg)
    d = tmp_path_factory.mktemp("dp_model")
    m.save_pretrained(d, safe_serialization=True)
    return str(d), m


def test_dp2_matches_hf_and_balances(model_dir):
    path, hf = model_dir
    e = Engine(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, dp_size=2, tp_size=1,
        load_balance_method="round_robin",
    )
    try:
        assert len(e.schedulers) == 2
        rng = np.random.default_rng(0)
        prompts = [rng.integers(3, VOCAB, size=n).tolist()
                   for n in (5, 9, 13, 17)]
        outs = e.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                             "ignore_eos": True},
        )
        for p, o in zip(prompts, outs):
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([p]), max_new_tokens=6, do_sample=False
                )[0][len(p):].tolist()
            assert o["output_ids"] == ref
        # both replicas did work (round-robin over 4 requests)
        st = e.get_internal_state()
        assert len(st["replicas"]) == 2
        assert all(s["forward_ct"] > 0 for s in st["replicas"])
        assert e.flush_cache()
    finally:
        e.shutdown()


def test_dp_shortest_queue_policy(model_dir):
    path, _ = model_dir
    e = Engine(
        model_path=path, dtype="float32", skip_tokenizer_init=True,
        page_size=4, max_total_tokens=2048, attention_backend="xla",
        random_seed=0, dp_size=2, tp_size=1,
        load_balance_method="shortest_queue",
    )
    try:
        prompts = [[5, 9, 11]] * 6
        outs = e.generate(
            input_ids=prompts,
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert all(len(o["output_ids"]) == 4 for o in outs)
    finally:
        e.shutdown()


def test_zmq_multihost_worker(model_dir, tmp_path):
    """Entry node + one ZMQ worker subprocess: generate end-to-end across
    the control plane; greedy output matches HF."""
    path, hf = model_dir
    port = 29710
    env = os.environ.copy()
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )
    env["SGLANG_TPU_FORCE_CPU"] = "1"
    worker = subprocess.Popen(
        [
            sys.executable, "-m", "sglang_npu_tpu.launch_worker",
            "--model-path", path, "--dtype", "float32",
            "--skip-tokenizer-init", "--page-size", "4",
            "--max-total-tokens", "2048", "--attention-backend", "xla",
            "--random-seed", "0",
            "--dist-init-addr", f"127.0.0.1:{port}",
            "--node-rank", "1", "--nnodes", "2",
        ],
        env=env,
        start_new_session=True,
    )
    e = None
    try:
        e = Engine(
            model_path=path, dtype="float32", skip_tokenizer_init=True,
            random_seed=0, nnodes=2, node_rank=0,
            dist_init_addr=f"127.0.0.1:{port}",
        )
        prompt = list(np.random.default_rng(0).integers(3, VOCAB, size=9))
        out = e.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                             "ignore_eos": True},
        )
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=6, do_sample=False
            )[0][9:].tolist()
        assert out["output_ids"] == ref
    finally:
        if e is not None:
            try:
                e.shutdown()
            except Exception:
                pass
        os.killpg(worker.pid, signal.SIGKILL)
        worker.wait(timeout=10)
