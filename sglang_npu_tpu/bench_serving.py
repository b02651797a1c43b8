"""Online serving load generator.

Counterpart of the reference's `python/sglang/bench_serving.py`
(`:720-737,1506-1556` metric definitions): drives the HTTP `/generate`
streaming API with Poisson arrivals and reports request/token throughput and
TTFT / TPOT / ITL mean/median/p95/p99.

Usage:
    python -m sglang_npu_tpu.bench_serving --base-url http://127.0.0.1:30000 \
        --num-prompts 128 --request-rate 8 --input-len 512 --output-len 128
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import sys
import time
from dataclasses import dataclass, field
from typing import List, Optional

import aiohttp
import numpy as np


@dataclass
class ReqResult:
    success: bool = False
    ttft: float = 0.0
    latency: float = 0.0
    itls: List[float] = field(default_factory=list)
    prompt_len: int = 0
    output_len: int = 0
    error: str = ""


async def run_one(session, base_url, input_ids, output_len):
    payload = {
        "input_ids": input_ids,
        "sampling_params": {
            "max_new_tokens": output_len,
            "temperature": 0.0,
            "ignore_eos": True,
        },
        "stream": True,
    }
    res = ReqResult(prompt_len=len(input_ids))
    st = time.perf_counter()
    last = st
    try:
        async with session.post(f"{base_url}/generate", json=payload) as resp:
            if resp.status != 200:
                res.error = f"HTTP {resp.status}"
                return res
            n_tokens = 0
            async for chunk in resp.content:
                line = chunk.decode().strip()
                if not line.startswith("data: ") or line == "data: [DONE]":
                    continue
                data = json.loads(line[len("data: ") :])
                now = time.perf_counter()
                new_n = len(data.get("output_ids", []))
                if n_tokens == 0 and new_n > 0:
                    res.ttft = now - st
                elif new_n > n_tokens:
                    res.itls.append((now - last) / max(new_n - n_tokens, 1))
                n_tokens = new_n
                last = now
            res.output_len = n_tokens
            res.latency = time.perf_counter() - st
            res.success = n_tokens > 0
    except Exception as e:  # noqa
        res.error = str(e)
    return res


async def benchmark(args):
    rng = np.random.default_rng(args.seed)
    prompts = [
        rng.integers(1, args.vocab_size, size=args.input_len).tolist()
        for _ in range(args.num_prompts)
    ]
    conn = aiohttp.TCPConnector(limit=args.max_concurrency or 0)
    timeout = aiohttp.ClientTimeout(total=None)
    results: List[ReqResult] = []
    async with aiohttp.ClientSession(connector=conn, timeout=timeout) as session:
        # warmup
        await run_one(session, args.base_url, prompts[0][:16], 4)

        async def worker(p, delay):
            await asyncio.sleep(delay)
            return await run_one(session, args.base_url, p, args.output_len)

        t0 = time.perf_counter()
        delays = []
        t = 0.0
        for _ in prompts:
            delays.append(t)
            if args.request_rate > 0:
                t += rng.exponential(1.0 / args.request_rate)
        results = await asyncio.gather(
            *[worker(p, d) for p, d in zip(prompts, delays)]
        )
        wall = time.perf_counter() - t0

    ok = [r for r in results if r.success]
    fails = [r for r in results if not r.success]
    if not ok:
        print(json.dumps({"error": "all requests failed", "example": fails[0].error}))
        return

    def pct(vals, q):
        return float(np.percentile(vals, q)) if vals else 0.0

    ttfts = [r.ttft * 1000 for r in ok]
    itls = [x * 1000 for r in ok for x in r.itls]
    tpots = [
        (r.latency - r.ttft) / max(r.output_len - 1, 1) * 1000 for r in ok
    ]
    total_out = sum(r.output_len for r in ok)
    total_in = sum(r.prompt_len for r in ok)
    metrics = {
        "completed": len(ok),
        "failed": len(fails),
        "duration_s": round(wall, 2),
        "request_throughput_rps": round(len(ok) / wall, 3),
        "input_token_throughput_tps": round(total_in / wall, 1),
        "output_token_throughput_tps": round(total_out / wall, 1),
        "mean_ttft_ms": round(float(np.mean(ttfts)), 1),
        "median_ttft_ms": round(pct(ttfts, 50), 1),
        "p95_ttft_ms": round(pct(ttfts, 95), 1),
        "p99_ttft_ms": round(pct(ttfts, 99), 1),
        "mean_tpot_ms": round(float(np.mean(tpots)), 2),
        "median_tpot_ms": round(pct(tpots, 50), 2),
        "p99_tpot_ms": round(pct(tpots, 99), 2),
        "mean_itl_ms": round(float(np.mean(itls)), 2) if itls else None,
        "p95_itl_ms": round(pct(itls, 95), 2) if itls else None,
        "p99_itl_ms": round(pct(itls, 99), 2) if itls else None,
    }
    print(json.dumps(metrics, indent=2))
    return metrics


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--base-url", type=str, default="http://127.0.0.1:30000")
    p.add_argument("--num-prompts", type=int, default=128)
    p.add_argument("--request-rate", type=float, default=0.0, help="0 = all at once")
    p.add_argument("--input-len", type=int, default=512)
    p.add_argument("--output-len", type=int, default=128)
    p.add_argument("--vocab-size", type=int, default=100000)
    p.add_argument("--max-concurrency", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    return asyncio.run(benchmark(args))


if __name__ == "__main__":
    main()
