"""Subprocess server launch + online load generator e2e (the reference's
dominant test pattern: `popen_launch_server` + bench_serving)."""

import os
import sys

import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_npu_tpu.test_utils import kill_process_tree, popen_launch_server

BASE = "http://127.0.0.1:31351"


def test_launch_server_and_bench_serving(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, torch_dtype="float32", eos_token_id=2,
    )
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("cli_model")
    transformers.LlamaForCausalLM(cfg).save_pretrained(d, safe_serialization=True)

    env = os.environ.copy()
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    env["SGLANG_TPU_FORCE_CPU"] = "1"
    proc = popen_launch_server(
        str(d),
        base_url=BASE,
        timeout=240,
        other_args=(
            "--dtype", "float32", "--tokenizer-mode", "byte",
            "--page-size", "4", "--max-total-tokens", "2048",
            "--attention-backend", "xla", "--skip-tokenizer-init",
        ),
        env=env,
    )
    try:
        from sglang_npu_tpu import bench_serving

        metrics = bench_serving.main(
            [
                "--base-url", BASE,
                "--num-prompts", "6",
                "--input-len", "16",
                "--output-len", "8",
                "--vocab-size", "250",
            ]
        )
        assert metrics["completed"] == 6
        assert metrics["failed"] == 0
        assert metrics["output_token_throughput_tps"] > 0
        assert metrics["mean_ttft_ms"] > 0
    finally:
        kill_process_tree(proc.pid)
