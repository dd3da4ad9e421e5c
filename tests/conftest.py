"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initialises, hence at conftest import time.
Sharded code paths are exercised on host CPU devices exactly as they would
compile for a TPU slice.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (TPU tunnel) at the profile level
# and the env var cannot override it; the config call can.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
