"""Test configuration: force an 8-device virtual CPU platform.

Must run before jax is imported anywhere — pytest imports conftest first.
Multi-chip sharding tests use this 8-device host mesh; the real TPU is only
used by bench.py / production entry points.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
