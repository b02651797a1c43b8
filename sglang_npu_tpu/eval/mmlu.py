"""Few-shot MMLU accuracy harness.

Counterpart of the reference's `python/sglang/test/simple_eval_mmlu.py`
(used by `test_nightly_gsm8k_eval.py`-style accuracy floors): loads
MMLU-format data from a LOCAL path (no network egress here), builds
k-shot multiple-choice prompts, and scores each choice letter by
teacher-forced logprob through the engine's scoring path — no sampling
noise, one forward per (question, choice).

Data format: JSONL rows {"question": str, "choices": [4 strings],
"answer": int (0-3) or "A".."D", "subject": str (optional)}; or a CSV in
the standard MMLU layout (question, A, B, C, D, answer).

Usage:
    python -m sglang_npu_tpu.eval.mmlu --model-path ... \
        --data-path mmlu_test.jsonl --num-questions 200
"""

from __future__ import annotations

import argparse
import csv
import json
import time

LETTERS = "ABCD"


def load_rows(path: str):
    rows = []
    if path.endswith(".csv"):
        with open(path, newline="") as f:
            for r in csv.reader(f):
                if len(r) < 6:
                    continue
                rows.append({
                    "question": r[0],
                    "choices": r[1:5],
                    "answer": r[5].strip(),
                })
    else:
        with open(path) as f:
            for line in f:
                if line.strip():
                    rows.append(json.loads(line))
    for r in rows:
        a = r["answer"]
        r["answer"] = LETTERS.index(a) if isinstance(a, str) else int(a)
    return rows


def format_question(row, with_answer: bool) -> str:
    out = row["question"].strip() + "\n"
    for i, c in enumerate(row["choices"]):
        out += f"{LETTERS[i]}. {c}\n"
    out += "Answer:"
    if with_answer:
        out += f" {LETTERS[row['answer']]}\n\n"
    return out


def run_eval(engine, data_path: str, num_questions=200, num_shots=5):
    rows = load_rows(data_path)
    shots = "".join(format_question(r, True) for r in rows[:num_shots])
    rows = rows[num_shots : num_shots + num_questions]

    t0 = time.time()
    correct = 0
    for row in rows:
        prompt = shots + format_question(row, False)
        # teacher-forced per-letter logprob (the engine /v1/score path)
        scores = engine.score(prompt, [f" {L}" for L in LETTERS])
        pred = max(range(4), key=lambda i: scores[i])
        correct += int(pred == row["answer"])
    dt = time.time() - t0
    n = len(rows)
    return {
        "accuracy": round(correct / max(n, 1), 4),
        "num_questions": n,
        "seconds": round(dt, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--data-path", required=True)
    p.add_argument("--num-questions", type=int, default=200)
    p.add_argument("--num-shots", type=int, default=5)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--page-size", type=int, default=64)
    args = p.parse_args(argv)

    import sglang_npu_tpu as sgl

    engine = sgl.Engine(
        model_path=args.model_path, dtype=args.dtype,
        page_size=args.page_size, random_seed=0,
    )
    try:
        res = run_eval(
            engine, args.data_path, args.num_questions, args.num_shots
        )
        print(json.dumps(res))
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
