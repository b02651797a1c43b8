"""MGSM (multilingual GSM8K) few-shot harness, local data.

Counterpart of the reference's `test/simple_eval_mgsm.py` for this
zero-egress environment: JSONL rows {"question": str, "answer": number
or str, "lang": str (optional)}; k-shot prompts are built PER LANGUAGE
(shots only from the same language, like the upstream eval), numeric
answers extracted with the simple-evals regex (last number, commas and
currency stripped).

Usage:
    python -m sglang_npu_tpu.eval.mgsm --model-path ... \
        --data-path mgsm.jsonl --num-questions 250
"""

from __future__ import annotations

import argparse
import json
import re
import time

INVALID = object()
_NUM = re.compile(r"-?[\d.,]+")


def extract_number(text: str):
    hits = _NUM.findall(text.replace("$", ""))
    for h in reversed(hits):
        h = h.replace(",", "").rstrip(".")
        try:
            return float(h)
        except ValueError:
            continue
    return INVALID


def load_jsonl(path: str):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def build_prompts(rows, num_questions: int, num_shots: int):
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.get("lang", "en"), []).append(r)
    prompts, labels = [], []
    for lang, lr in by_lang.items():
        shots = "".join(
            f"Question: {ex['question']}\nAnswer: {ex['answer']}\n\n"
            for ex in lr[:num_shots]
        )
        for ex in lr[num_shots:]:
            prompts.append(shots + f"Question: {ex['question']}\nAnswer:")
            labels.append(extract_number(str(ex["answer"])))
            if len(prompts) >= num_questions:
                return prompts, labels
    return prompts, labels


def run_eval(engine, data_path: str, num_questions=250, num_shots=5,
             max_new_tokens=384):
    rows = load_jsonl(data_path)
    prompts, labels = build_prompts(rows, num_questions, num_shots)
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
    preds = [extract_number(o["text"]) for o in outs]
    acc = sum(
        p is not INVALID and l is not INVALID and p == l
        for p, l in zip(preds, labels)
    ) / max(len(labels), 1)
    return {
        "accuracy": round(acc, 4),
        "num_questions": len(labels),
        "invalid_rate": round(
            sum(p is INVALID for p in preds) / max(len(preds), 1), 4
        ),
        "seconds": round(dt, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--data-path", required=True)
    p.add_argument("--num-questions", type=int, default=250)
    p.add_argument("--num-shots", type=int, default=5)
    p.add_argument("--max-new-tokens", type=int, default=384)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    from sglang_npu_tpu.entrypoints.engine import Engine

    engine = Engine(model_path=args.model_path, dtype=args.dtype, random_seed=0)
    try:
        print(json.dumps(run_eval(
            engine, args.data_path, args.num_questions, args.num_shots,
            args.max_new_tokens,
        )))
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
