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


def small_cfg(**train_kw):
    """Tiny full-featured model config shared across test modules (importing
    between test modules breaks when pytest collects a subset)."""
    from fastspeech2_tpu.config import Config, ModelConfig, TrainConfig

    return Config(
        model=ModelConfig(adim=32, aheads=2, elayers=1, eunits=64, ddim=32,
                          dlayers=1, dunits=64, postnet_layers=2, postnet_chans=16,
                          positionwise_conv_kernel_size=3,
                          duration_predictor_chans=16),
        train=TrainConfig(**train_kw) if train_kw else TrainConfig(),
    )
