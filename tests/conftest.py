"""Test configuration: run everything on a virtual 8-device CPU mesh.

The TPU-analogue of the reference's qemu cross-arch test strategy
(SURVEY.md §4): sharding/collective logic is validated on
`--xla_force_host_platform_device_count=8` CPU devices, and kernel semantics
are checked bit-exactly against the packed reference oracle.
"""

import os

# Must run before jax creates its backends. NOTE: the environment's
# sitecustomize pins JAX_PLATFORMS to the remote TPU platform, so setting the
# env var is not enough — we must also override the config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers",
                            "slow: long-running test (multi-process spawns)")


@pytest.fixture
def rng():
    return np.random.default_rng(42)
