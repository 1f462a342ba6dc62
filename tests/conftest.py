"""Test harness config: force CPU with 8 virtual devices.

Multi-device sharding logic (DP/spatial meshes) is tested on a virtual
8-device CPU mesh so no TPU slice is required, per the project build
rules.

NOTE: this environment registers an `axon` TPU PJRT plugin from
sitecustomize and pins JAX_PLATFORMS=axon; the env var alone is NOT
enough to get CPU — we must override the jax config after import,
before any backend is touched. XLA_FLAGS must still be set before the
CPU client is created (first device query).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight tests (large-tile sharding, full-width models); "
        "deselect with -m 'not slow'",
    )
