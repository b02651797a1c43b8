"""Server CLI: `python -m sglang_npu_tpu.launch_server --model-path ...`
(reference `python/sglang/launch_server.py`)."""

import sys

from sglang_npu_tpu.entrypoints.http_server import launch_server
from sglang_npu_tpu.server_args import prepare_server_args

if __name__ == "__main__":
    server_args = prepare_server_args(sys.argv[1:])
    launch_server(server_args)
