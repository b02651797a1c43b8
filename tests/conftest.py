"""Test configuration: force JAX onto a virtual 8-device CPU platform so the
full stack (sharding included) runs in CPU-only CI, mirroring the reference's
device-free unit-test layer (SURVEY.md §4)."""

import os
import sys

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
