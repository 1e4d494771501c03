"""Test configuration.

* Forces 8 virtual CPU devices (XLA_FLAGS must be set before jax import —
  pytest imports conftest first). Sharding tests build their Mesh from
  `jax.devices("cpu")`, so they run identically with or without a real TPU
  attached. (Note: on this machine the axon TPU plugin ignores JAX_PLATFORMS,
  so we do NOT rely on platform filtering.)
* Sets matmul precision to "highest" so numeric parity tests are meaningful
  even when the default backend is a TPU (whose default matmul is bf16).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_threefry_partitionable", True)

# CPU fast lane: run the whole suite on the (virtual) host devices so model
# tests compile locally instead of through the remote TPU compile service
# (which costs ~40 min for a cold full run). Set MOBI_TPU_TEST_DEVICE=default
# to exercise the real accelerator.
if os.environ.get("MOBI_TPU_TEST_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

from mobi_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) == 8, f"expected 8 forced host devices, got {len(devs)}"
    return devs
