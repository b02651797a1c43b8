"""Few-shot GSM8K accuracy harness.

Counterpart of the reference's `python/sglang/test/few_shot_gsm8k.py` (used
by the Ascend CI accuracy floors, `test_ascend_tp1_bf16.py:16-22`): loads
GSM8K-format JSONL from a local path (this environment has no network
egress; point --data-path at a local copy), builds k-shot prompts, runs the
engine in parallel, extracts the last integer answer and reports accuracy +
throughput.

Usage:
    python -m sglang_npu_tpu.eval.few_shot_gsm8k \
        --model-path ... --data-path gsm8k_test.jsonl --num-questions 200
"""

from __future__ import annotations

import argparse
import json
import re
import time

INVALID = -9999999


def get_answer_value(answer_str: str) -> int:
    """Extract the final integer (reference behavior: last number wins)."""
    answer_str = answer_str.replace(",", "")
    numbers = re.findall(r"-?\d+", answer_str)
    if not numbers:
        return INVALID
    return int(numbers[-1])


def load_jsonl(path: str):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def build_prompts(data, num_questions: int, num_shots: int):
    few_shot = ""
    for ex in data[:num_shots]:
        few_shot += f"Question: {ex['question']}\nAnswer: {ex['answer']}\n\n"
    qs, labels = [], []
    for ex in data[num_shots : num_shots + num_questions]:
        qs.append(few_shot + f"Question: {ex['question']}\nAnswer:")
        labels.append(get_answer_value(ex["answer"]))
    return qs, labels


def run_eval(engine, data_path: str, num_questions=200, num_shots=5, max_new_tokens=512):
    data = load_jsonl(data_path)
    prompts, labels = build_prompts(data, num_questions, num_shots)
    t0 = time.time()
    outs = engine.generate(
        prompts,
        {
            "max_new_tokens": max_new_tokens,
            "temperature": 0.0,
            "stop": ["Question:", "\n\n"],
        },
    )
    dt = time.time() - t0
    if not isinstance(outs, list):
        outs = [outs]
    preds = [get_answer_value(o["text"]) for o in outs]
    acc = sum(p == l for p, l in zip(preds, labels)) / max(len(labels), 1)
    out_tokens = sum(o["meta_info"]["completion_tokens"] for o in outs)
    return {
        "accuracy": round(acc, 4),
        "num_questions": len(labels),
        "invalid_rate": round(sum(p == INVALID for p in preds) / max(len(preds), 1), 4),
        "output_throughput_tok_s": round(out_tokens / dt, 1),
        "latency_s": round(dt, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--data-path", required=True)
    p.add_argument("--num-questions", type=int, default=200)
    p.add_argument("--num-shots", type=int, default=5)
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--tp-size", type=int, default=1)
    args = p.parse_args()

    from sglang_npu_tpu.entrypoints.engine import Engine

    engine = Engine(model_path=args.model_path, tp_size=args.tp_size)
    try:
        metrics = run_eval(
            engine,
            args.data_path,
            args.num_questions,
            args.num_shots,
            args.max_new_tokens,
        )
        print(json.dumps(metrics, indent=2))
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
