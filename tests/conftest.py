"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The axon TPU tunnel in this image registers itself via sitecustomize before
pytest starts (and routes every compile through a remote helper that lacks
f64/c128), so we flip the platform to CPU via jax.config — which works even
after jax was imported, as long as no backend has been initialized yet — and
expose 8 virtual CPU devices for sharding tests.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(100)
