"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding tests run anywhere (SURVEY.md §4 implications).

Note: this environment's sitecustomize registers a remote TPU backend at
interpreter startup regardless of JAX_PLATFORMS, so we must override the
platform through jax.config (before any computation) AND set the host
device-count flag (before backend initialization).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# compiled Mosaic kernels don't exist on CPU; run Pallas paths interpreted
from torchpq_tpu import config as _tpq_config

_tpq_config.PALLAS_INTERPRET = True
