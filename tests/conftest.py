"""Test configuration: force JAX onto a virtual 8-device CPU platform so the
full stack (sharding included) runs in CPU-only CI, mirroring the reference's
device-free unit-test layer (SURVEY.md §4).

Note: the environment's sitecustomize force-registers the axon TPU backend
and sets jax_platforms to it, so we must override the *config* after import
(env vars alone are not enough) — otherwise every unit test would run over
the real-TPU tunnel.
"""

import os
import sys

# Must be set before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
# Persistent CPU compile cache: tests build the same tiny-model programs
# over and over (and xdist workers compile them concurrently on 4 cores
# — slow enough to trip PD control-RPC timeouts without a cache).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# async test support for the HTTP layer (no pytest-asyncio in this image)
pytest_plugins = ["aiohttp.pytest_plugin"]

# Inner-loop test tier (`pytest -m fast`, < 3 min): the core engine path —
# scheduler/batching, KV + radix, kernels (interpret mode), quantization,
# sampling, constrained decoding.  The full 13-min suite stays the round
# gate; this tier is for the edit-test loop (VERDICT r4 weak #7).
FAST_MODULES = {
    "test_allocator",
    "test_radix_cache",
    "test_schedule_batch",
    "test_scheduler_policy",
    "test_engine",
    "test_quantization",
    "test_w4_quantization",
    "test_pallas_decode",
    "test_pallas_prefill",
    "test_pallas_quant_kv",
    "test_int8_kv",
    "test_penalties",
    "test_logprobs",
    "test_n_logit_bias",
    "test_constrained",
    "test_custom_logit_processor",
    "test_sessions",
    "test_mixed_chunk",
    "test_window_pipelining",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "fast: inner-loop tier (core engine path, < 3 min)"
    )


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in FAST_MODULES:
            item.add_marker(_pytest.mark.fast)


def pytest_sessionfinish(session, exitstatus):
    session.config._exitstatus = int(exitstatus)


def pytest_unconfigure(config):
    # XLA/aiohttp worker threads can abort in C++ static destructors at
    # interpreter exit (after all tests passed); skip that teardown entirely
    # so the recorded exit status is the test result.
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(getattr(config, "_exitstatus", 0))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
