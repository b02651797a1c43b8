"""Named test suites (reference `test/srt/run_suite.py` + CI runner
mapping, SURVEY.md §4).

Usage:
    python tests/run_suite.py --suite per-commit-cpu
    python tests/run_suite.py --suite per-commit-tpu   # needs the real chip
"""

from __future__ import annotations

import argparse
import subprocess
import sys

SUITES = {
    # device-free unit + CPU-mesh e2e layers (every commit)
    "per-commit-cpu": [
        "test_allocator.py",
        "test_radix_cache.py",
        "test_schedule_batch.py",
        "test_parsers.py",
        "test_constrained.py",
        "test_pallas_decode.py",
        "test_pallas_prefill.py",
        "test_pallas_quant_kv.py",
        "test_pallas_padded_head_dim.py",
        "test_model_numerics.py",
        "test_engine.py",
        "test_http_server.py",
        "test_logprobs.py",
        "test_penalties.py",
        "test_moe_models.py",
        "test_gemma2.py",
        "test_embedding.py",
        "test_speculative.py",
        "test_sessions.py",
        "test_lang.py",
        "test_int8_kv.py",
        "test_quantization.py",
        "test_deepseek_v2.py",
        "test_hicache.py",
        "test_lora.py",
        "test_pd_disaggregation.py",
        "test_router.py",
        "test_qwen2.py",
        "test_qwen3.py",
        "test_launch_server.py",
        "test_tensor_parallel.py",
        "test_w4_quantization.py",
        "test_eagle.py",
        "test_data_parallel.py",
        "test_round2_fixes.py",
    ],
    # real-chip smoke (driver/nightly): engine throughput floor
    "per-commit-tpu": ["__bench_quick__"],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="per-commit-cpu", choices=sorted(SUITES))
    p.add_argument("--timeout-per-file", type=int, default=600)
    args = p.parse_args()

    files = SUITES[args.suite]
    failed = []
    pytest_files = [f for f in files if not f.startswith("__")]
    if pytest_files:
        # one pytest process for the whole suite: per-file processes would
        # pay the jax/torch import cost ~25s each
        cmd = [sys.executable, "-m", "pytest", "-q"] + [
            f"tests/{f}" for f in pytest_files
        ]
        try:
            r = subprocess.run(cmd, timeout=args.timeout_per_file * 4)
            if r.returncode != 0:
                failed.append("pytest suite")
        except subprocess.TimeoutExpired:
            failed.append("pytest suite (timeout)")
    if "__bench_quick__" in files:
        try:
            r = subprocess.run(
                [sys.executable, "bench.py", "--quick"],
                timeout=args.timeout_per_file * 4,
            )
            if r.returncode != 0:
                failed.append("bench quick")
        except subprocess.TimeoutExpired:
            failed.append("bench quick (timeout)")
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("suite passed")


if __name__ == "__main__":
    main()
