"""Test harness configuration.

Tests run on a simulated 8-device CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``) so sharding and
collectives are exercised without TPU hardware (SURVEY.md §4).

This container force-selects a remote-TPU PJRT platform ("axon") via a
``sitecustomize`` that runs before any test code and pins
``jax_platforms`` in jax's config (plain ``JAX_PLATFORMS=cpu`` env vars
are therefore ignored).  Override it through the config API before any
backend initializes.  Set ``NVR_TESTS_ON_TPU=1`` to run the suite on the
real chip instead.
"""

import os

if os.environ.get("NVR_TESTS_ON_TPU") != "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
