"""Scaling-efficiency harness: tokens/s/chip at tp=1 (one process) vs
tp=N across two processes (cross-host SPMD), the north-star ">=85%
scaling 1 chip -> 2 hosts" measurement (BASELINE.md).

On this CI image it runs over virtual CPU devices (2 x N/2), which
validates the full code path and prints the efficiency arithmetic; on a
real 2-host TPU deployment the same flags measure true ICI/DCN scaling:

    host0: python scripts/bench_scaling.py --role entry  --nnodes 2 ...
    host1: python scripts/bench_scaling.py --role worker --nnodes 2 ...

Single-machine usage (spawns both processes):
    python scripts/bench_scaling.py [--tp 8] [--steps 64] [--batch 32]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TINY = {
    "architectures": ["LlamaForCausalLM"],
    "model_type": "llama",
    "vocab_size": 512,
    "hidden_size": 256,
    "num_hidden_layers": 4,
    "num_attention_heads": 8,
    "num_key_value_heads": 8,
    "intermediate_size": 1024,
    "max_position_embeddings": 1024,
    "rms_norm_eps": 1e-5,
    "torch_dtype": "float32",
}


def _measure(engine, batch: int, steps: int) -> float:
    """Decode throughput (tok/s) over `steps` new tokens x `batch` reqs."""
    prompts = [[3 + (i % 100), 5, 7, 11] for i in range(batch)]
    sp = {"max_new_tokens": steps, "temperature": 0.0, "ignore_eos": True}
    engine.generate(input_ids=prompts[:2], sampling_params=sp)  # warm
    t0 = time.time()
    outs = engine.generate(input_ids=prompts, sampling_params=sp)
    dt = time.time() - t0
    toks = sum(len(o["output_ids"]) for o in outs)
    return toks / dt


def run_child(role: str, args):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.tp // 2}"
    )
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    common = dict(
        model_path=args.model_dir,
        load_format="dummy",
        dtype="float32",
        skip_tokenizer_init=True,
        page_size=8,
        max_total_tokens=65536,
        attention_backend="xla",
        random_seed=0,
        tp_size=args.tp,
        multihost_spmd=True,
        nnodes=2,
        dist_init_addr=f"127.0.0.1:{args.port}",
        spmd_local_devices=args.tp // 2,
    )
    if role == "worker":
        from sglang_npu_tpu.launch_worker import run_worker_spmd
        from sglang_npu_tpu.server_args import ServerArgs

        run_worker_spmd(ServerArgs(node_rank=1, **common))
        return
    from sglang_npu_tpu.entrypoints.engine import Engine

    e = Engine(node_rank=0, **common)
    try:
        tps = _measure(e, args.batch, args.steps)
    finally:
        e.shutdown()
    print(json.dumps({"spmd_tok_per_s": tps}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=8)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--role", default="main")  # main | entry | worker
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--model-dir", default="")
    args = ap.parse_args()

    if args.role in ("entry", "worker"):
        run_child(args.role, args)
        return

    model_dir = tempfile.mkdtemp(prefix="scaling_")
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(TINY, f)
    args.model_dir = model_dir

    # --- tp=1 single process baseline ---
    env1 = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS",)}
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import jax, json, sys, time; jax.config.update('jax_platforms', %r);"
        "sys.path.insert(0, %r);"
        "from sglang_npu_tpu.entrypoints.engine import Engine;"
        "from scripts.bench_scaling import _measure;"
        "e = Engine(model_path=%r, load_format='dummy', dtype='float32',"
        " skip_tokenizer_init=True, page_size=8, max_total_tokens=65536,"
        " attention_backend='xla', random_seed=0, tp_size=1);"
        "tps = _measure(e, %d, %d); e.shutdown();"
        "print(json.dumps({'tp1_tok_per_s': tps}))"
    ) % (args.platform, REPO, model_dir, args.batch, args.steps)
    out1 = subprocess.run(
        [sys.executable, "-c", code], env=env1, capture_output=True, text=True,
        cwd=REPO, timeout=900,
    )
    assert out1.returncode == 0, out1.stdout + out1.stderr
    tp1 = json.loads(out1.stdout.strip().splitlines()[-1])["tp1_tok_per_s"]

    # --- tp=N across 2 processes ---
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    base = [sys.executable, os.path.abspath(__file__), "--tp", str(args.tp),
            "--steps", str(args.steps), "--batch", str(args.batch),
            "--platform", args.platform, "--port", str(port),
            "--model-dir", model_dir]
    envc = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS",)}
    pw = subprocess.Popen(base + ["--role", "worker"], env=envc, cwd=REPO,
                          stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    pe = subprocess.run(base + ["--role", "entry"], env=envc, cwd=REPO,
                        capture_output=True, text=True, timeout=1200)
    pw.wait(timeout=60)
    assert pe.returncode == 0, pe.stdout[-2000:] + pe.stderr[-2000:]
    spmd = json.loads(pe.stdout.strip().splitlines()[-1])["spmd_tok_per_s"]

    per_chip_tp1 = tp1
    per_chip_spmd = spmd / args.tp
    print(json.dumps({
        "tp1_tok_per_s_per_chip": round(per_chip_tp1, 2),
        f"tp{args.tp}_2proc_tok_per_s": round(spmd, 2),
        f"tp{args.tp}_2proc_tok_per_s_per_chip": round(per_chip_spmd, 2),
        "scaling_efficiency_pct": round(100 * per_chip_spmd / per_chip_tp1, 1),
        "note": "CPU virtual devices unless run on a 2-host TPU deployment",
    }))


if __name__ == "__main__":
    main()
