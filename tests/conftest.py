"""Test harness: run JAX on a virtual 8-device CPU mesh so CI needs no TPU.

The environment may import jax at interpreter start (sitecustomize) with
JAX_PLATFORMS pointing at a TPU backend, so plain env vars are too late here;
`jax.config.update` still works because backends initialise lazily.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
