"""GPQA multiple-choice harness (local data, logprob-scored).

Counterpart of the reference's `test/simple_eval_gpqa.py` for this
zero-egress environment: JSONL rows {"question": str, "choices": [4],
"answer": int 0-3 or "A".."D"} (pre-shuffled GPQA-diamond export); each
choice letter is scored by teacher-forced logprob through the engine's
scoring path (no sampling noise — the same method as eval/mmlu.py).

Usage:
    python -m sglang_npu_tpu.eval.gpqa --model-path ... \
        --data-path gpqa_diamond.jsonl --num-questions 198
"""

from __future__ import annotations

import argparse
import json
import time

from sglang_npu_tpu.eval.mmlu import LETTERS, format_question, load_rows

PREAMBLE = (
    "What is the correct answer to this question?\n\n"
)


def run_eval(engine, data_path: str, num_questions=198, num_shots=0):
    rows = load_rows(data_path)
    shots = "".join(format_question(r, True) for r in rows[:num_shots])
    rows = rows[num_shots : num_shots + num_questions]
    t0 = time.time()
    correct = 0
    for row in rows:
        prompt = PREAMBLE + shots + format_question(row, False)
        scores = engine.score(prompt, [f" {L}" for L in LETTERS])
        pred = max(range(len(row["choices"])), key=lambda i: scores[i])
        correct += int(pred == row["answer"])
    n = len(rows)
    return {
        "accuracy": round(correct / max(n, 1), 4),
        "num_questions": n,
        "seconds": round(time.time() - t0, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--data-path", required=True)
    p.add_argument("--num-questions", type=int, default=198)
    p.add_argument("--num-shots", type=int, default=0)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    from sglang_npu_tpu.entrypoints.engine import Engine

    engine = Engine(model_path=args.model_path, dtype=args.dtype, random_seed=0)
    try:
        print(json.dumps(run_eval(
            engine, args.data_path, args.num_questions, args.num_shots
        )))
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
