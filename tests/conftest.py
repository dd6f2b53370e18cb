"""Test configuration: force an 8-device CPU mesh before the JAX backend
initializes.

Multi-chip sharding is validated on virtual CPU devices (SURVEY.md §4) —
the real TPU is exercised by bench.py, not the unit suite.

Note: plugins (jaxtyping) import jax before this conftest runs, so env vars
alone are too late — ``jax.config.update`` still works until the first
backend use.
"""

import os

# belt (for subprocesses)...
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# ...and suspenders (for this process, where jax may already be imported)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
