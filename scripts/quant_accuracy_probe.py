"""Quantization-accuracy probe v2: task accuracy + fidelity of every
quantized serving mode against the F32 baseline, on a locally TRAINED
model (round-4; the round-3 random-init probe had near-tie margins that
made agreement numbers nearly uninformative).

With zero egress (no GSM8K data, no pretrained checkpoints reachable)
this is the strongest measurable accuracy evidence available here (see
ACCURACY.md):

  1. a tiny llama is TRAINED to convergence on a synthetic copy-grammar
     corpus (deterministic, cached under ~/.cache) — its logit margins
     are trained-like (reported), and every prompt has a GROUND-TRUTH
     continuation;
  2. the engine serves it under each quantization mode; we report
     * task accuracy (exact-match completion) — the GSM8K-delta analogue,
     * greedy top-1 agreement vs the unquantized engine,
     * mean |logprob| delta on agreeing tokens,
     * margin statistics (top1-top2 logit gap) so the numbers are
       interpretable.

    python scripts/quant_accuracy_probe.py [--on-chip]

Prints one JSON line per mode.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

VOCAB = 512
BOS, EOS, SEP = 1, 2, 3
CKPT_DIR = os.path.expanduser("~/.cache/sglang_tpu_tiny_trained_v1")


def make_copy_batch(rng, batch, seq):
    """[BOS, payload(k), SEP, payload(k), EOS, pad...] — the model learns
    exact copy after SEP (peaked, verifiable continuations)."""
    import numpy as np

    k = (seq - 3) // 2
    pay = rng.integers(8, VOCAB, size=(batch, k))
    out = np.zeros((batch, seq), dtype=np.int64)
    out[:, 0] = BOS
    out[:, 1 : 1 + k] = pay
    out[:, 1 + k] = SEP
    out[:, 2 + k : 2 + 2 * k] = pay
    out[:, 2 + 2 * k] = EOS
    return out


def train_tiny(force=False, cfg=None, ckpt_dir=None, model_cls=None):
    """Train a tiny causal LM to convergence on the synthetic copy
    grammar (deterministic, cached).  Defaults to the llama probe model;
    pass (cfg, ckpt_dir, model_cls) to train other families — e.g. the
    DeepSeek-V2 MLA model the on-chip parity check uses so its margins
    are trained-like too (near-tie degenerate runs on random init flip
    argmax between torch-CPU and the chip)."""
    import numpy as np
    import torch
    import transformers

    if cfg is None:
        cfg = transformers.LlamaConfig(
            vocab_size=VOCAB, hidden_size=256, intermediate_size=768,
            num_hidden_layers=4, num_attention_heads=8,
            num_key_value_heads=4, head_dim=128,
            max_position_embeddings=512, torch_dtype="float32",
            eos_token_id=EOS, tie_word_embeddings=False,
        )
    CKPT_DIR = ckpt_dir or globals()["CKPT_DIR"]
    model_cls = model_cls or transformers.LlamaForCausalLM
    if not force and os.path.exists(os.path.join(CKPT_DIR, "config.json")):
        return CKPT_DIR
    torch.manual_seed(0)
    model = model_cls(cfg)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4)
    rng = np.random.default_rng(0)
    torch.set_num_threads(os.cpu_count() or 8)
    steps = int(os.environ.get("TINY_TRAIN_STEPS", "1200"))
    for step in range(steps):
        seq = int(rng.integers(19, 51)) | 1  # odd lengths, k in [8, 24]
        batch = torch.tensor(make_copy_batch(rng, 48, seq))
        out = model(input_ids=batch, labels=batch)
        out.loss.backward()
        opt.step()
        opt.zero_grad()
        if step % 100 == 0:
            print(f"train step {step}: loss {float(out.loss):.4f}", flush=True)
    model.eval()
    os.makedirs(CKPT_DIR, exist_ok=True)
    model.save_pretrained(CKPT_DIR, safe_serialization=True)
    print(f"trained checkpoint cached at {CKPT_DIR}", flush=True)
    return CKPT_DIR


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--on-chip", action="store_true")
    ap.add_argument("--prompts", type=int, default=32)
    ap.add_argument("--retrain", action="store_true")
    args = ap.parse_args()

    if not args.on_chip:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=1"
        )
    import jax

    if not args.on_chip:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch
    import transformers

    d = train_tiny(force=args.retrain)
    hf = transformers.LlamaForCausalLM.from_pretrained(d).float().eval()

    # held-out copy prompts: [BOS, payload, SEP] -> expect payload + EOS
    rng = np.random.default_rng(1234)
    prompts, answers = [], []
    for i in range(args.prompts):
        k = int(rng.integers(8, 25))
        pay = rng.integers(8, VOCAB, size=k).tolist()
        prompts.append([BOS] + pay + [SEP])
        answers.append(pay + [EOS])

    # margin statistics on the baseline model (trained-like evidence)
    with torch.no_grad():
        gaps = []
        for p, a in zip(prompts[:8], answers[:8]):
            logits = hf(torch.tensor([p + a[:-1]])).logits[0]
            for pos in range(len(p) - 1, logits.shape[0]):
                v, _ = torch.topk(logits[pos], 2)
                gaps.append(float(v[0] - v[1]))
        margins = {
            "mean_top1_top2_logit_gap": round(float(np.mean(gaps)), 3),
            "p10_gap": round(float(np.percentile(gaps, 10)), 3),
        }
    print(json.dumps({"margins": margins}), flush=True)

    from sglang_npu_tpu.entrypoints.engine import Engine

    def run(mode):
        repack = False
        if mode == "w4a8_repack":
            mode, repack = "w4a8", True
        e = Engine(
            model_path=d, dtype="float32" if not args.on_chip else "bfloat16",
            skip_tokenizer_init=True, page_size=16, max_total_tokens=32768,
            random_seed=0, quantization=mode,
            w4_repack_int8=repack,
            watchdog_timeout=3600.0,
        )
        try:
            outs = e.generate(
                input_ids=prompts,
                sampling_params={
                    "max_new_tokens": 28, "temperature": 0.0,
                },
                return_logprob=True,
            )
            toks = [o["output_ids"] for o in outs]
            lps = [
                [x[0] for x in o["meta_info"]["output_token_logprobs"]]
                for o in outs
            ]
            return toks, lps
        finally:
            e.shutdown()

    def task_acc(toks):
        ok = 0
        for t, a in zip(toks, answers):
            body = t[: len(a)]
            if body[: len(a) - 1] == a[:-1]:
                ok += 1
        return ok / len(answers)

    base_toks, base_lps = run(None)
    base_acc = task_acc(base_toks)
    print(
        json.dumps({"mode": "baseline_f32", "task_accuracy": base_acc}),
        flush=True,
    )
    results = {}
    for mode in ("fp8", "w8a8_int8", "w4a16", "w4a8", "w4a8_repack"):
        toks, lps = run(mode)
        agree = total = 0
        deltas = []
        for bt, t, bl, l in zip(base_toks, toks, base_lps, lps):
            for i in range(min(len(bt), len(t))):
                total += 1
                if bt[i] == t[i]:
                    agree += 1
                    deltas.append(abs(bl[i] - l[i]))
                else:
                    break
        acc = task_acc(toks)
        rec = {
            "mode": mode,
            "task_accuracy": round(acc, 4),
            "task_accuracy_delta_vs_f32": round(acc - base_acc, 4),
            "greedy_top1_agreement": round(agree / max(total, 1), 4),
            "mean_abs_logprob_delta": round(float(np.mean(deltas)), 5)
            if deltas
            else None,
            "prompts": len(prompts),
        }
        results[mode] = rec
        print(json.dumps(rec), flush=True)
    print(json.dumps({
        "baseline_task_accuracy": base_acc,
        **{k: v["task_accuracy"] for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
