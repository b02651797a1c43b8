"""HumanEval pass@1 harness (local data, sandboxed execution).

Counterpart of the reference's `test/simple_eval_humaneval.py` (which
wraps the `human-eval` package) rebuilt self-contained for this
zero-egress environment: loads HumanEval-format JSONL from a local path
({"task_id", "prompt", "test", "entry_point"}), generates one completion
per task through the Engine, and checks functional correctness by
executing `prompt + completion + test + check(entry_point)` in a
subprocess with a wall-clock timeout (the same execution contract as
`human_eval.execution.check_correctness`).

Usage:
    python -m sglang_npu_tpu.eval.humaneval --model-path ... \
        --data-path HumanEval.jsonl --num-tasks 50
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

STOP = ["\ndef ", "\nclass ", "\nif __name__", "\nprint(", "\n#"]


def load_jsonl(path: str):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def extract_completion(text: str) -> str:
    """Cut the generation at the first top-level statement (the model is
    asked to complete a function body)."""
    for s in STOP:
        i = text.find(s)
        if i >= 0:
            text = text[:i]
    return text


def _run_candidate(code: str, q):
    try:
        import contextlib
        import io

        g = {"__name__": "__humaneval__"}
        with contextlib.redirect_stdout(io.StringIO()):
            exec(code, g)  # noqa: S102 - the point of the benchmark
        q.put("pass")
    except BaseException as e:  # noqa: BLE001
        q.put(f"fail: {type(e).__name__}: {e}")


def check_correctness(sample: dict, completion: str, timeout: float = 6.0):
    """Execute the candidate program in a subprocess; returns (ok, msg)."""
    code = (
        sample["prompt"]
        + completion
        + "\n"
        + sample["test"]
        + f"\ncheck({sample['entry_point']})\n"
    )
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    proc = ctx.Process(target=_run_candidate, args=(code, q))
    proc.start()
    proc.join(timeout)
    if proc.is_alive():
        proc.terminate()
        proc.join()
        return False, "timeout"
    msg = q.get() if not q.empty() else "fail: no result"
    return msg == "pass", msg


def run_eval(engine, data_path: str, num_tasks=164, max_new_tokens=384):
    tasks = load_jsonl(data_path)[:num_tasks]
    t0 = time.time()
    outs = engine.generate(
        [t["prompt"] for t in tasks],
        {"max_new_tokens": max_new_tokens, "temperature": 0.0, "stop": STOP},
    )
    if not isinstance(outs, list):
        outs = [outs]
    gen_s = time.time() - t0
    passed = 0
    results = []
    for t, o in zip(tasks, outs):
        ok, msg = check_correctness(t, extract_completion(o["text"]))
        passed += int(ok)
        results.append({"task_id": t.get("task_id"), "pass": ok, "msg": msg})
    n = len(tasks)
    return {
        "pass@1": round(passed / max(n, 1), 4),
        "num_tasks": n,
        "gen_seconds": round(gen_s, 1),
        "results": results,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--data-path", required=True)
    p.add_argument("--num-tasks", type=int, default=164)
    p.add_argument("--max-new-tokens", type=int, default=384)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    from sglang_npu_tpu.entrypoints.engine import Engine

    engine = Engine(model_path=args.model_path, dtype=args.dtype, random_seed=0)
    try:
        res = run_eval(
            engine, args.data_path, args.num_tasks, args.max_new_tokens
        )
        res.pop("results")
        print(json.dumps(res))
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
