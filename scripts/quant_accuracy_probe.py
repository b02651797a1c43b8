"""Quantization-accuracy probe: greedy agreement + logprob divergence of
each quantized serving mode against the BF16/F32 baseline.

With zero egress (no GSM8K data, no pretrained checkpoints reachable),
this is the strongest measurable accuracy evidence available in this
environment (see ACCURACY.md): a locally-built real-weights model serves
through the FULL engine under every quantization mode, and we measure
token-level fidelity against the unquantized engine over a prompt corpus.

    python scripts/quant_accuracy_probe.py [--on-chip]

Prints one JSON line per mode:
  {"mode": ..., "greedy_top1_agreement": ..., "mean_abs_logprob_delta": ...}
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--on-chip", action="store_true")
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--prompts", type=int, default=24)
    ap.add_argument("--max-new", type=int, default=24)
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

    cfg = transformers.LlamaConfig(
        vocab_size=2048, hidden_size=args.hidden,
        intermediate_size=args.hidden * 3, num_hidden_layers=args.layers,
        num_attention_heads=8, num_key_value_heads=4, head_dim=128,
        max_position_embeddings=1024, torch_dtype="float32",
        eos_token_id=2, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(cfg)
    d = tempfile.mkdtemp(prefix="quant_acc_")
    hf.save_pretrained(d, safe_serialization=True)

    from sglang_npu_tpu.entrypoints.engine import Engine

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(3, 2048, size=int(k)).tolist()
        for k in np.linspace(8, 96, args.prompts)
    ]
    sp = {
        "max_new_tokens": args.max_new,
        "temperature": 0.0,
        "ignore_eos": True,
    }

    def run(mode):
        e = Engine(
            model_path=d, dtype="float32" if not args.on_chip else "bfloat16",
            skip_tokenizer_init=True, page_size=16, max_total_tokens=16384,
            random_seed=0, quantization=mode,
            watchdog_timeout=3600.0,
        )
        try:
            outs = e.generate(
                input_ids=prompts, sampling_params={**sp}, return_logprob=True
            )
            toks = [o["output_ids"] for o in outs]
            lps = [
                [x[0] for x in o["meta_info"]["output_token_logprobs"]]
                for o in outs
            ]
            return toks, lps
        finally:
            e.shutdown()

    base_toks, base_lps = run(None)
    results = {}
    for mode in ("fp8", "w8a8_int8", "w4a16", "w4a8"):
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
                    break  # past the first divergence tokens aren't comparable
        rec = {
            "mode": mode,
            "greedy_top1_agreement": round(agree / max(total, 1), 4),
            "mean_abs_logprob_delta": round(float(np.mean(deltas)), 5)
            if deltas
            else None,
            "prompts": len(prompts),
            "tokens_per_prompt": args.max_new,
        }
        results[mode] = rec
        print(json.dumps(rec), flush=True)
    print(json.dumps({"baseline": "unquantized", **{
        k: v["greedy_top1_agreement"] for k, v in results.items()
    }}))


if __name__ == "__main__":
    main()
