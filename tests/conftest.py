"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-idiomatic "multi-node without a cluster" mechanism (SURVEY.md
§4c): SPMD sharding tests compile and execute against 8 virtual CPU devices,
the same program shape that runs on a real TPU pod slice.

Must set env vars BEFORE jax initializes a backend.
"""

import os

# Force CPU even when the shell env points at the TPU (axon); the test suite
# exercises SPMD on the virtual mesh. Override with WSDL_TEST_PLATFORM=tpu.
# NOTE: the axon site hook overrides JAX_PLATFORMS, so we must also set it via
# jax.config after import.
_platform = os.environ.get("WSDL_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
