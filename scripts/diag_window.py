"""Per-window timing breakdown for decode (round-4): wraps the runner's
decode_dispatch/decode_fetch to log wall-time per window and the
dispatch->fetch gap during a real bench-shaped run.

Usage: python scripts/diag_window.py CONFIG BATCH DECODE_STEPS
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
    cfg_name = sys.argv[1] if len(sys.argv) > 1 else "llama8b_w4a16_int8kv"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    decode_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    import bench as B

    spec = B.CONFIGS[cfg_name]
    from sglang_npu_tpu.entrypoints.engine import Engine
    from sglang_npu_tpu.server_args import ServerArgs

    model_dir = tempfile.mkdtemp(prefix="diagw_")
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(spec["model"], f)

    engine = Engine(
        ServerArgs(
            model_path=model_dir, load_format="dummy", dtype="bfloat16",
            quantization=spec["quantization"],
            kv_cache_dtype=spec["kv_cache_dtype"], page_size=16,
            max_total_tokens=max(spec["max_total_tokens"], batch * 320),
            skip_tokenizer_init=True, random_seed=0,
            max_prefill_tokens=8192, chunked_prefill_size=4096,
            decode_log_interval=1000000, watchdog_timeout=3600.0,
            decode_steps=decode_steps,
        )
    )
    runner = engine.scheduler.runner
    events = []
    orig_dispatch = runner.decode_dispatch
    orig_fetch = runner.decode_fetch

    def dispatch(mwb, chain_from=None):
        t0 = time.perf_counter()
        h = orig_dispatch(mwb, chain_from=chain_from)
        events.append(("dispatch", t0, time.perf_counter(),
                       len(mwb.seq_lens), chain_from is not None))
        return h

    def fetch(handle):
        t0 = time.perf_counter()
        out = orig_fetch(handle)
        events.append(("fetch", t0, time.perf_counter(), 0, False))
        return out

    runner.decode_dispatch = dispatch
    runner.decode_fetch = fetch
    orig_fas = runner.forward_and_sample

    def fas(mwb):
        t0 = time.perf_counter()
        out = orig_fas(mwb)
        events.append(
            (
                f"extend[{mwb.forward_mode}]",
                t0,
                time.perf_counter(),
                len(mwb.seq_lens),
                False,
            )
        )
        return out

    runner.forward_and_sample = fas

    try:
        rng = np.random.default_rng(0)
        prompts = [
            rng.integers(1, 120000, size=128).tolist() for _ in range(batch)
        ]
        sp = {"max_new_tokens": 128, "temperature": 0.0, "ignore_eos": True}
        engine.generate(
            input_ids=prompts, sampling_params={**sp, "max_new_tokens": 16}
        )
        engine.flush_cache()
        events.clear()
        t0 = time.time()
        engine.generate(input_ids=prompts, sampling_params=sp)
        total = time.time() - t0
        print(f"total: {total*1e3:.0f} ms for {batch}x128 tokens "
              f"({batch*128/total:.0f} tok/s)", flush=True)
        # summarize
        last_end = None
        print("win  kind      call_ms  gap_ms  bs  chained")
        for i, (kind, a, b, bs, chained) in enumerate(events[:40]):
            gap = (a - last_end) * 1e3 if last_end else 0.0
            print(f"{i:3d}  {kind:8s} {1e3*(b-a):8.1f} {gap:7.1f}  {bs:3d}  {chained}")
            last_end = b
        # aggregate
        fetches = [(b - a) for k, a, b, *_ in events if k == "fetch"]
        dispatches = [(b - a) for k, a, b, *_ in events if k == "dispatch"]
        print(f"n_windows={len(fetches)} fetch_ms median={np.median(fetches)*1e3:.1f} "
              f"dispatch_ms median={np.median(dispatches)*1e3:.1f}")
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
