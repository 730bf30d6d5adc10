"""Test harness: force CPU with 8 virtual devices (SURVEY §4 "distributed
without a cluster") so shard_map/pjit paths are exercised without TPU chips.

Must set XLA flags before jax initializes — hence module-level, first import.
"""

import os

# Force CPU even though the shell exports JAX_PLATFORMS=axon (the TPU tunnel):
# unit tests must run on the 8-virtual-device CPU mesh, not the single chip.
# The axon sitecustomize imports jax at interpreter startup, so the env var is
# already consumed — override through jax.config (backends are still lazy).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64 available for golden oracles
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
