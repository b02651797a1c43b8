"""Server CLI: `python -m sglang_npu_tpu.launch_server --model-path ...`
(reference `python/sglang/launch_server.py`).

Set SGLANG_TPU_FORCE_CPU=1 to pin the process to the CPU backend (CI /
multi-process tests; the environment's sitecustomize would otherwise claim
the TPU)."""

import os
import sys

if os.environ.get("SGLANG_TPU_FORCE_CPU") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

from sglang_npu_tpu.entrypoints.http_server import launch_server
from sglang_npu_tpu.server_args import prepare_server_args

def main():
    server_args = prepare_server_args(sys.argv[1:])
    launch_server(server_args)


if __name__ == "__main__":
    main()
