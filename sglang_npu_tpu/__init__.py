"""sglang_npu_tpu: a TPU-native LLM serving engine.

A from-scratch re-design of the SGLang-class serving stack
(reference: sglang-npu/sglang_npu) for TPU hardware: JAX/XLA SPMD over a
device mesh, Pallas kernels for paged attention, a zero-overhead
continuous-batching scheduler with RadixAttention prefix caching, and an
OpenAI-compatible serving API.

Public surface mirrors the reference's top-level package
(`python/sglang/__init__.py`): `Engine`, `ServerArgs`, `launch_server`.
"""

__version__ = "0.1.0"

from sglang_npu_tpu.server_args import ServerArgs  # noqa: F401


def __getattr__(name):
    # Lazy imports so that light-weight users (pure scheduler tests) do not
    # pay for jax / fastapi import time.
    if name == "Engine":
        from sglang_npu_tpu.entrypoints.engine import Engine

        return Engine
    if name == "launch_server":
        from sglang_npu_tpu.entrypoints.http_server import launch_server

        return launch_server
    raise AttributeError(f"module 'sglang_npu_tpu' has no attribute {name!r}")


__all__ = ["Engine", "ServerArgs", "launch_server", "__version__"]
