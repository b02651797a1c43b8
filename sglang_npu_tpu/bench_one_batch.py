"""Single-batch latency benchmark.

Counterpart of the reference's `bench_one_batch.py` (one static batch,
prefill latency / decode latency / throughput breakdown) built on the
Engine API and the per-request stage timings: reports prefill latency
(TTFT), median inter-token latency, and end-to-end throughput for one
batch of identical-shape requests.

    python -m sglang_npu_tpu.bench_one_batch --model-path ... \
        --batch-size 8 --input-len 128 --output-len 32 [--load-format dummy]

Prints one JSON line per run.
"""

from __future__ import annotations

import argparse
import json
import statistics
import time

import numpy as np


def run_bench(engine, batch_size: int, input_len: int, output_len: int,
              vocab: int, warmup: bool = True) -> dict:
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(3, max(vocab - 1, 4), size=input_len).tolist()
        for _ in range(batch_size)
    ]
    sp = {
        "max_new_tokens": output_len,
        "temperature": 0.0,
        "ignore_eos": True,
    }
    if warmup:
        engine.generate(input_ids=prompts[:1], sampling_params=dict(sp))
        engine.flush_cache()
    t0 = time.time()
    outs = engine.generate(input_ids=prompts, sampling_params=sp)
    wall = time.time() - t0
    ttfts = [o["meta_info"].get("ttft") for o in outs]
    itls = [o["meta_info"].get("itl_mean") for o in outs]
    ttfts = [t for t in ttfts if t is not None]
    itls = [t for t in itls if t is not None]
    total_out = sum(len(o["output_ids"]) for o in outs)
    return {
        "batch_size": batch_size,
        "input_len": input_len,
        "output_len": output_len,
        "prefill_latency_s": round(max(ttfts), 4) if ttfts else None,
        "median_itl_s": (
            round(statistics.median(itls), 5) if itls else None
        ),
        "decode_tok_s": (
            round(total_out / wall, 1) if wall > 0 else None
        ),
        "total_latency_s": round(wall, 3),
        "input_throughput_tok_s": round(
            batch_size * input_len / max(max(ttfts), 1e-9), 1
        ) if ttfts else None,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--load-format", default="auto")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--batch-size", type=int, nargs="+", default=[8])
    p.add_argument("--input-len", type=int, nargs="+", default=[128])
    p.add_argument("--output-len", type=int, nargs="+", default=[32])
    p.add_argument("--page-size", type=int, default=64)
    p.add_argument("--mem-fraction-static", type=float, default=None)
    p.add_argument("--attention-backend", default=None)
    args = p.parse_args(argv)

    import sglang_npu_tpu as sgl

    kw = dict(
        model_path=args.model_path,
        load_format=args.load_format,
        dtype=args.dtype,
        skip_tokenizer_init=True,
        page_size=args.page_size,
        random_seed=0,
    )
    if args.attention_backend:
        kw["attention_backend"] = args.attention_backend
    if args.mem_fraction_static:
        kw["mem_fraction_static"] = args.mem_fraction_static
    engine = sgl.Engine(**kw)
    vocab = engine.model_config.vocab_size
    try:
        for bs in args.batch_size:
            for il in args.input_len:
                for ol in args.output_len:
                    res = run_bench(engine, bs, il, ol, vocab)
                    print(json.dumps(res), flush=True)
                    engine.flush_cache()
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
