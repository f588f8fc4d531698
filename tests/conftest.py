"""Test harness: 8 virtual CPU devices for mesh/sharding tests.

Multi-host behavior is tested without a pod via
xla_force_host_platform_device_count (SURVEY.md section 4), the standard
JAX substitute for a fake collective backend.

Note: this image's site hook registers a remote TPU backend and pins
jax_platforms via jax.config (env vars are overridden), so we flip the
config back to CPU after import, before any backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture()
def np_rng():
    return np.random.RandomState(1234)
