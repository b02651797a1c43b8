"""CLI entry: ``python -m sglang_npu_tpu.router --worker-urls ...``."""

from sglang_npu_tpu.router.router import main

if __name__ == "__main__":
    main()
