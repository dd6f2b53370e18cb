"""Seeding (reference ``utils/common.py:9-13`` seeds torch/cuda/numpy/random;
here: numpy + python random + a JAX key factory — JAX randomness is
explicitly keyed, not global)."""

from __future__ import annotations

import random

import numpy as np


def setup_seed(seed: int):
    """Seed host RNGs; returns a jax.random key for device randomness."""
    np.random.seed(seed)
    random.seed(seed)
    import jax
    return jax.random.key(seed)
