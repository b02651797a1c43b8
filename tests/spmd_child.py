"""Child driver for the cross-host SPMD tests: one OS process per "host",
each exposing 4 virtual CPU devices, joined via jax.distributed — the
2-host analogue of the reference's multi-node scheduler processes
(`engine.py:715-741`), validated without real hosts.

    python tests/spmd_child.py RANK NNODES PORT MODEL_DIR OUT_JSON [TP]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

rank = int(sys.argv[1])
nnodes = int(sys.argv[2])
port = int(sys.argv[3])
model_dir = sys.argv[4]
out_json = sys.argv[5]
tp = int(sys.argv[6]) if len(sys.argv) > 6 else 8

N_LOCAL = int(os.environ.get("SPMD_CHILD_LOCAL_DEVICES", "4"))
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_LOCAL}"
    ).strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

COMMON = dict(
    model_path=model_dir,
    load_format=os.environ.get("SPMD_CHILD_LOAD_FORMAT", "auto"),
    dtype="float32",
    skip_tokenizer_init=True,
    page_size=4,
    max_total_tokens=4096,
    attention_backend="xla",
    random_seed=0,
    tp_size=tp,
    multihost_spmd=True,
    nnodes=nnodes,
    dist_init_addr=f"127.0.0.1:{port}",
    spmd_local_devices=N_LOCAL,
)

PROMPTS = [
    list(range(3, 8)),
    [5, 9, 23, 54, 11, 88, 41, 67, 100, 13, 29, 31, 7, 90, 61, 77, 19, 3],
    [101, 4, 55, 66],
]


def main():
    if rank == 0:
        from sglang_npu_tpu.entrypoints.engine import Engine

        e = Engine(node_rank=0, **COMMON)
        try:
            outs = e.generate(
                input_ids=PROMPTS,
                sampling_params={"max_new_tokens": 6, "temperature": 0.0},
            )
            with open(out_json, "w") as f:
                json.dump([o["output_ids"] for o in outs], f)
        finally:
            e.shutdown()
    else:
        from sglang_npu_tpu.launch_worker import run_worker_spmd
        from sglang_npu_tpu.server_args import ServerArgs

        args = ServerArgs(node_rank=rank, **COMMON)
        run_worker_spmd(args)


if __name__ == "__main__":
    main()
