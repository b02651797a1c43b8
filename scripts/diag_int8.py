"""Bisect the int8-weights post-warmup hang on the TPU.

Runs a llama-class engine with --quantization int8 at a configurable
layer count / batch / window depth, logging compile events and phase
timestamps so a silent hang can be localized (compile vs deadlock).

Usage (always under `timeout` on the chip):
  timeout 900 python scripts/diag_int8.py --layers 2 --batch 4
"""

import argparse
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_LOG_COMPILES", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--decode-steps", type=int, default=32)
    p.add_argument("--prompt-len", type=int, default=128)
    p.add_argument("--max-new", type=int, default=128)
    p.add_argument("--quant", type=str, default="int8")
    p.add_argument("--kv", type=str, default="int8")
    p.add_argument("--no-pipelining", action="store_true")
    p.add_argument("--attention-backend", type=str, default=None)
    args = p.parse_args()

    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": 128256,
        "hidden_size": 4096,
        "num_hidden_layers": args.layers,
        "num_attention_heads": 32,
        "num_key_value_heads": 8,
        "head_dim": 128,
        "intermediate_size": 14336,
        "max_position_embeddings": 8192,
        "rms_norm_eps": 1e-5,
        "rope_theta": 500000.0,
        "tie_word_embeddings": False,
        "torch_dtype": "bfloat16",
    }
    model_dir = tempfile.mkdtemp(prefix="diag_int8_")
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(cfg, f)

    from sglang_npu_tpu.entrypoints.engine import Engine
    from sglang_npu_tpu.server_args import ServerArgs

    log(f"engine init: L={args.layers} batch={args.batch} "
        f"quant={args.quant} kv={args.kv} steps={args.decode_steps} "
        f"pipelining={'off' if args.no_pipelining else 'on'}")
    engine = Engine(
        ServerArgs(
            model_path=model_dir,
            load_format="dummy",
            dtype="bfloat16",
            quantization=args.quant,
            kv_cache_dtype=args.kv,
            page_size=16,
            max_total_tokens=max(
                8192, args.batch * (args.prompt_len + args.max_new + 64)
            ),
            skip_tokenizer_init=True,
            attention_backend=args.attention_backend,
            random_seed=0,
            max_prefill_tokens=8192,
            chunked_prefill_size=4096,
            decode_log_interval=1000000,
            watchdog_timeout=3600.0,
            decode_steps=args.decode_steps,
            disable_window_pipelining=args.no_pipelining,
        )
    )
    try:
        rng = np.random.default_rng(0)
        prompts = [
            rng.integers(1, 120000, size=args.prompt_len).tolist()
            for _ in range(args.batch)
        ]
        sp = {"max_new_tokens": args.max_new, "temperature": 0.0,
              "ignore_eos": True}

        log("warmup (max_new=16) ...")
        t0 = time.time()
        engine.generate(input_ids=prompts,
                        sampling_params={**sp, "max_new_tokens": 16})
        log(f"warmup done in {time.time()-t0:.1f}s; flush")
        engine.flush_cache()

        log("single-request full shape ...")
        t0 = time.time()
        engine.generate(input_ids=prompts[0], sampling_params=sp)
        log(f"single done in {time.time()-t0:.1f}s; flush")
        engine.flush_cache()

        log(f"timed batch pass (max_new={args.max_new}) ...")
        t0 = time.time()
        outs = engine.generate(input_ids=prompts, sampling_params=sp)
        dt = time.time() - t0
        total = sum(len(o["output_ids"]) for o in outs)
        log(f"batch pass done in {dt:.1f}s -> {total/dt:.1f} tok/s")
    finally:
        log("shutdown")
        engine.shutdown()
    log("OK")


if __name__ == "__main__":
    main()
