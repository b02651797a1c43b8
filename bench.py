"""Benchmark: offline serving throughput on one TPU chip.

Analogue of the reference's `bench_offline_throughput.py` (Engine-level
load): N concurrent requests with random prompts through the full engine
(scheduler + radix cache + paged KV + jit decode ladder), dummy-weight
Llama-3.2-1B-class model in BF16.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

Baseline anchor: the reference's in-repo CI floor is >30 tok/s offline
output throughput (Qwen2.5-7B BF16 on one Ascend 910B,
`test/srt/test_ascend_tp1_bf16.py:20,91-95`); see BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# Persistent compile cache: survives process restarts (the remote-compile
# path of the tunneled TPU backend is slow and occasionally flaky).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

BASELINE_TOK_S = 30.0

# Llama-3.2-3B-class shape: head_dim 128 (pallas decode kernel path),
# ~6.3 GB of bf16 weights — fits one v5e chip with a large KV pool.
LLAMA_3B = {
    "architectures": ["LlamaForCausalLM"],
    "model_type": "llama",
    "vocab_size": 128256,
    "hidden_size": 3072,
    "num_hidden_layers": 28,
    "num_attention_heads": 24,
    "num_key_value_heads": 8,
    "head_dim": 128,
    "intermediate_size": 8192,
    "max_position_embeddings": 8192,
    "rms_norm_eps": 1e-5,
    "rope_theta": 500000.0,
    "tie_word_embeddings": True,
    "torch_dtype": "bfloat16",
}
LLAMA_1B = LLAMA_3B  # back-compat alias for older scripts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-requests", type=int, default=64)
    p.add_argument("--prompt-len", type=int, default=128)
    p.add_argument("--max-new", type=int, default=128)
    p.add_argument("--page-size", type=int, default=16)
    p.add_argument("--attention-backend", type=str, default=None)
    p.add_argument("--quantization", type=str, default=None)
    p.add_argument("--quick", action="store_true", help="small smoke run")
    args = p.parse_args()
    if args.quick:
        args.num_requests, args.prompt_len, args.max_new = 4, 32, 16

    import json as _json
    import tempfile

    from sglang_npu_tpu.entrypoints.engine import Engine
    from sglang_npu_tpu.server_args import ServerArgs

    model_dir = tempfile.mkdtemp(prefix="bench_model_")
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        _json.dump(LLAMA_3B, f)

    engine = Engine(
        ServerArgs(
            model_path=model_dir,
            load_format="dummy",
            dtype="bfloat16",
            page_size=args.page_size,
            skip_tokenizer_init=True,
            attention_backend=args.attention_backend,
            quantization=args.quantization,
            random_seed=0,
            max_prefill_tokens=8192,
            chunked_prefill_size=4096,
            decode_log_interval=1000000,
            watchdog_timeout=3600.0,  # first compiles can take minutes
        )
    )

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(1, 120000, size=args.prompt_len).tolist()
        for _ in range(args.num_requests)
    ]
    sp = {"max_new_tokens": args.max_new, "temperature": 0.0, "ignore_eos": True}

    # Warmup with the full workload shape so every prefill/decode bucket is
    # compiled outside the timed region, then drop all KV state.
    engine.generate(
        input_ids=prompts, sampling_params={**sp, "max_new_tokens": 16}
    )
    engine.flush_cache()

    t0 = time.time()
    outs = engine.generate(input_ids=prompts, sampling_params=sp)
    dt = time.time() - t0
    total_out = sum(len(o["output_ids"]) for o in outs)
    tput = total_out / dt

    result = {
        "metric": "offline_output_tok_per_s_per_chip_llama3b_"
        + ("int8w" if args.quantization else "bf16"),
        "value": round(tput, 2),
        "unit": "tok/s",
        "vs_baseline": round(tput / BASELINE_TOK_S, 2),
    }
    engine.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
