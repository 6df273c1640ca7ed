"""Test harness: force an 8-virtual-device CPU platform BEFORE jax imports,
so sharding/pjit tests run anywhere (the standard trick for testing
multi-chip code without chips)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the environment's sitecustomize force-registers the axon TPU backend and
# OVERRIDES the JAX_PLATFORMS env var via jax.config — undo it explicitly,
# or "CPU" tests silently run through the TPU tunnel
jax.config.update("jax_platforms", "cpu")

from kpvid_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
