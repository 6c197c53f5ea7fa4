"""Test config: run everything on a virtual 8-device CPU mesh.

Env vars + explicit jax.config (the axon TPU plugin in this image ignores
JAX_PLATFORMS from the environment, so force via config before any test
imports build jitted functions).
"""

import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
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
    return np.random.default_rng(3141592)
