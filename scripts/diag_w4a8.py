"""Phase-split diagnosis of the w4a8 end-to-end collapse (round-4).

Runs the exact bench.py workload (64 reqs, 128/128) for one config and
times prefill-only (max_new=1) vs the full run, so the missing time
localizes to prefill / decode / host orchestration.

Run ON the TPU under `timeout`.
"""

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    cfg_name = sys.argv[1] if len(sys.argv) > 1 else "llama8b_w4a8_int8kv"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    decode_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as B

    spec = B.CONFIGS[cfg_name]
    from sglang_npu_tpu.entrypoints.engine import Engine
    from sglang_npu_tpu.server_args import ServerArgs

    model_dir = tempfile.mkdtemp(prefix=f"diag_{cfg_name}_")
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(spec["model"], f)

    engine = Engine(
        ServerArgs(
            model_path=model_dir,
            load_format="dummy",
            dtype="bfloat16",
            quantization=spec["quantization"],
            kv_cache_dtype=spec["kv_cache_dtype"],
            page_size=16,
            max_total_tokens=max(spec["max_total_tokens"], batch * 320),
            skip_tokenizer_init=True,
            random_seed=0,
            max_prefill_tokens=8192,
            chunked_prefill_size=4096,
            decode_log_interval=1000000,
            watchdog_timeout=3600.0,
            decode_steps=decode_steps,
        )
    )
    try:
        print(f"config={cfg_name} batch={batch} decode_steps={decode_steps}",
              flush=True)
        rng = np.random.default_rng(0)
        prompts = [
            rng.integers(1, 120000, size=128).tolist() for _ in range(batch)
        ]
        sp = {"max_new_tokens": 128, "temperature": 0.0, "ignore_eos": True}

        def run(tag, n_new, reps=1):
            best = float("inf")
            for _ in range(reps):
                engine.flush_cache()
                t0 = time.time()
                engine.generate(
                    input_ids=prompts,
                    sampling_params={**sp, "max_new_tokens": n_new},
                )
                best = min(best, time.time() - t0)
            print(f"{tag:28s}: {best*1e3:9.1f} ms", flush=True)
            return best

        # warmup all buckets
        t0 = time.time()
        engine.generate(input_ids=prompts, sampling_params={**sp, "max_new_tokens": 16})
        print(f"warmup(16 new)          : {(time.time()-t0)*1e3:9.1f} ms", flush=True)
        engine.flush_cache()

        t_pre = run("prefill-only (max_new=1)", 1, reps=2)
        t17 = run("prefill+16 decode", 17, reps=2)
        t_full = run("full (128 new)", 128, reps=2)
        dec_per_step_early = (t17 - t_pre) / 16
        dec_per_step_late = (t_full - t17) / 111
        print(f"decode steps 1-16  : {dec_per_step_early*1e3:7.2f} ms/step")
        print(f"decode steps 17-128: {dec_per_step_late*1e3:7.2f} ms/step")
        print(f"implied tok/s (full): {batch*128/t_full:.1f}")
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
