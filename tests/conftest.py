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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    Each XLA:CPU executable holds several live memory mappings; the full
    suite compiles thousands of programs and walks into the kernel's
    vm.max_map_count ceiling (65,530 by default) near the end of the run,
    at which point a failed mmap inside LLVM segfaults the process (seen
    as a crash in backend_compile_and_load on the last test file).
    Clearing per module bounds the live-executable population while still
    letting parametrized tests within a module share compilations.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(100)
