"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-idiomatic "multi-node without a cluster" mechanism (SURVEY.md
§4c): SPMD sharding tests compile and execute against 8 virtual CPU devices,
the same program shape that runs on a real TPU pod slice.

Must set env vars BEFORE jax initializes a backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
