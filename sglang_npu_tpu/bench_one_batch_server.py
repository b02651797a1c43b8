"""One-batch benchmark through the HTTP server.

Counterpart of the reference's `bench_one_batch_server.py`: launches the
HTTP server as a subprocess, waits for /health, fires ONE batch of
generate requests and reports latency / throughput / TTFT — the
end-to-end serving-path analogue of `bench_one_batch.py` (which times
the engine in-process).

Usage:
    python -m sglang_npu_tpu.bench_one_batch_server --model-path ... \
        --batch-size 16 --input-len 128 --output-len 64
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
import urllib.request


def _post(url: str, payload: dict, timeout: float = 600.0):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def wait_health(base: str, deadline_s: float = 600.0):
    t0 = time.time()
    while time.time() - t0 < deadline_s:
        try:
            with urllib.request.urlopen(base + "/health", timeout=5):
                return True
        except Exception:
            time.sleep(2.0)
    return False


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--input-len", type=int, default=128)
    p.add_argument("--output-len", type=int, default=64)
    p.add_argument("--port", type=int, default=30099)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--load-format", default="auto")
    p.add_argument("--extra-args", default="", help="extra launch_server flags")
    p.add_argument("--base-url", default=None,
                   help="benchmark an ALREADY RUNNING server instead")
    args = p.parse_args(argv)

    proc = None
    base = args.base_url or f"http://127.0.0.1:{args.port}"
    if args.base_url is None:
        cmd = [
            sys.executable, "-m", "sglang_npu_tpu.launch_server",
            "--model-path", args.model_path,
            "--port", str(args.port),
            "--dtype", args.dtype,
            "--load-format", args.load_format,
            "--skip-tokenizer-init", "true",
        ] + (args.extra_args.split() if args.extra_args else [])
        proc = subprocess.Popen(cmd)
    try:
        if not wait_health(base):
            raise RuntimeError("server did not become healthy")
        import numpy as np

        rng = np.random.default_rng(0)
        ids = [
            rng.integers(10, 1000, size=args.input_len).tolist()
            for _ in range(args.batch_size)
        ]
        sp = {
            "max_new_tokens": args.output_len,
            "temperature": 0.0,
            "ignore_eos": True,
        }
        # warmup (compiles)
        _post(base + "/generate", {
            "input_ids": ids, "sampling_params": {**sp, "max_new_tokens": 4},
        })
        # TTFT probe: single request, one token
        t0 = time.time()
        _post(base + "/generate", {
            "input_ids": ids[0],
            "sampling_params": {**sp, "max_new_tokens": 1},
        })
        ttft = time.time() - t0
        # the one batch
        t0 = time.time()
        outs = _post(base + "/generate", {
            "input_ids": ids, "sampling_params": sp,
        })
        dt = time.time() - t0
        total_out = sum(len(o["output_ids"]) for o in outs)
        print(json.dumps({
            "batch_size": args.batch_size,
            "input_len": args.input_len,
            "output_len": args.output_len,
            "latency_s": round(dt, 3),
            "ttft_s": round(ttft, 3),
            "output_throughput_tok_s": round(total_out / dt, 1),
            "total_throughput_tok_s": round(
                (total_out + args.batch_size * args.input_len) / dt, 1
            ),
        }))
    finally:
        if proc is not None:
            proc.terminate()
            proc.wait(timeout=30)


if __name__ == "__main__":
    main()
