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

# Tests must NEVER contend on the real chip mutex: bench.py's _ChipLock holds
# the flock until process exit BY DESIGN, so a test that exercises it (e.g.
# test_bench_fallback) would otherwise starve a live chip queue for the rest
# of the pytest session (observed 2026-08-19 19:40-19:54: a full-EDSR chunk
# blocked 14 min on flock held by a CPU-only pytest run).  Point the lock at
# a per-session scratch file before anything imports bench.
os.environ["SR_CHIP_LOCK"] = f"/tmp/sr_chip_test_{os.getpid()}.lock"
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


def pytest_collection_modifyitems(config, items):
    """Fast default path (VERDICT r3 #9): the full suite crossed 17 min on
    this 1-core host, so the slowest e2e tests are marked ``slow`` and
    deselected by default.  Run EVERYTHING with ``SR_TEST_ALL=1 pytest``
    (CI mode) or select explicitly with ``-m slow`` / ``-m ''``.
    """
    if os.environ.get("SR_TEST_ALL") or config.getoption("-m"):
        return
    kept, dropped = [], []
    for item in items:
        (dropped if item.get_closest_marker("slow") else kept).append(item)
    if dropped:
        config.hook.pytest_deselected(items=dropped)
        items[:] = kept
