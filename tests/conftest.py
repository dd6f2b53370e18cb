"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip sharding is validated on virtual CPU devices (SURVEY.md §4) —
the real TPU is exercised by bench.py, not the unit suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
