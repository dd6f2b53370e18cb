"""Test configuration: force an 8-device CPU mesh before the JAX backend
initializes.

Multi-chip sharding is validated on virtual CPU devices (SURVEY.md §4) —
the real TPU is exercised by bench.py, not the unit suite.

Note: plugins (jaxtyping) import jax before this conftest runs, so env vars
alone are too late — ``jax.config.update`` still works until the first
backend use.
"""

import os

# MCM_TPU_TEST_TPU=1 points the suite at the attached real TPU instead:
# the chip-gated tests (test_ops "on_chip"/"pallas_mh") stop skipping and
# everything else runs single-device. Intended for targeted -k runs —
# the full suite on a tunneled dev chip would pay a remote compile per
# executable.
_REAL_TPU = os.environ.get("MCM_TPU_TEST_TPU") == "1"

# belt (for subprocesses)...
if not _REAL_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
# jax 0.9's async CPU dispatch intermittently SIGABRTs in the
# device-to-host of sharded arrays when one process compiles many
# mesh/sharding variants (~1-in-5 full runs of test_train; reproduced,
# and 10/10 clean with dispatch synchronous at no measurable cost).
# CPU-only; the real TPU backend never sees this setting.
os.environ.setdefault("JAX_CPU_ENABLE_ASYNC_DISPATCH", "false")

# ...and suspenders (for this process, where jax may already be imported)
import jax  # noqa: E402

if not _REAL_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_cpu_enable_async_dispatch", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
