"""Seeding (reference ``utils/common.py:9-13`` seeds torch/cuda/numpy/random;
here: numpy + python random only — JAX randomness is explicitly keyed at
use sites.  Deliberately NO ``jax.random.key`` here: key creation dispatches
a device program, which on the tunneled dev TPU costs a ~60 s first-use
remote load (CLAUDE.md; the same pathology the numpy param init removed)."""

from __future__ import annotations

import random

import numpy as np


def setup_seed(seed: int) -> None:
    """Seed host RNGs."""
    np.random.seed(seed)
    random.seed(seed)
