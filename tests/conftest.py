"""Test configuration: run everything on CPU with 8 virtual devices so
sharding/collective tests work without TPU hardware (SURVEY.md 4).

Note: this environment's sitecustomize force-registers a TPU PJRT plugin and
sets JAX_PLATFORMS=axon in every interpreter; ``jax.config.update`` after
import is the reliable way to pin tests to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
