"""Round-5 in-engine decode-window bisection.

The component probe (r5_probe_decode.py) predicts ~38 ms/step at batch 256
for llama8b_w4a8 (attn 19.5 + mm 15.4 + head ~1 + misc) but the engine
measures 64 ms.  Bisect by monkeypatching parts of the model out BEFORE
engine construction, so each variant compiles a window without that part:

  base   — unmodified window (sanity anchor)
  noattn — attention returns q, no kernel call / no KV write
  nomm   — all quantized matmuls return zeros (weights never stream)
  noboth — both

Usage: timeout 2400 python scripts/r5_bisect_window.py MODE [BATCH] [PS]
Run ON the TPU under timeout, one mode per process.
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
    mode = sys.argv[1] if len(sys.argv) > 1 else "base"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    ps = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import jax.numpy as jnp

    import sglang_npu_tpu.models.llama as L

    if mode in ("noattn", "noboth"):
        def no_attention(self, q, k, v, kv_pool, layer_idx, fb, page_size):
            return q, kv_pool

        L.LlamaForCausalLM._attention = no_attention
    if mode in ("nomm", "noboth"):
        from sglang_npu_tpu.layers import quantization as Q

        def fake_qmm(x, w, eq):
            n = (
                w.s.shape[-1]
                if hasattr(w, "s") and hasattr(w, "b")
                else (w.q.shape[-1] if hasattr(w, "q") else w.shape[-1])
            )
            return jnp.zeros((*x.shape[:-1], n), x.dtype)

        L.qmm = fake_qmm
        Q.matmul = fake_qmm

    import bench as B
    from sglang_npu_tpu.entrypoints.engine import Engine
    from sglang_npu_tpu.server_args import ServerArgs

    spec = B.CONFIGS["llama8b_w4a8_int8kv"]
    model_dir = tempfile.mkdtemp(prefix="bisect_")
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(spec["model"], f)
    engine = Engine(
        ServerArgs(
            model_path=model_dir, load_format="dummy", dtype="bfloat16",
            quantization=spec["quantization"],
            kv_cache_dtype=spec["kv_cache_dtype"], page_size=ps,
            max_total_tokens=max(spec["max_total_tokens"], batch * 320),
            skip_tokenizer_init=True, random_seed=0,
            max_prefill_tokens=8192, chunked_prefill_size=4096,
            decode_log_interval=1000000, watchdog_timeout=3600.0,
            decode_steps=32,
        )
    )
    runner = engine.scheduler.runner
    events = []
    orig_dispatch, orig_fetch = runner.decode_dispatch, runner.decode_fetch
    orig_fas = runner.forward_and_sample

    def dispatch(mwb, chain_from=None):
        h = orig_dispatch(mwb, chain_from=chain_from)
        events.append(("dispatch", time.perf_counter(), len(mwb.seq_lens)))
        return h

    def fetch(h):
        out = orig_fetch(h)
        events.append(("fetch", time.perf_counter(), 0))
        return out

    def fas(mwb):
        out = orig_fas(mwb)
        events.append(("extend", time.perf_counter(), 0))
        return out

    runner.decode_dispatch, runner.decode_fetch = dispatch, fetch
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
        gaps, last_f, bs, ext = [], None, 0, False
        for kind, t, b in events:
            if kind == "extend":
                ext = True
            elif kind == "dispatch":
                bs = max(bs, b)
            else:
                if last_f and not ext and bs >= batch:
                    gaps.append(t - last_f)
                last_f, ext, bs = t, False, 0
        step_ms = np.median(gaps) * 1e3 / 32 if gaps else float("nan")
        print(
            f"MODE={mode} B={batch} ps={ps}: step={step_ms:.2f} ms "
            f"(windows={len(gaps)}, total {total:.1f}s, "
            f"{batch*128/total:.0f} tok/s)",
            flush=True,
        )
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
