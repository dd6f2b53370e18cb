"""Sharded-train tests, subprocess-isolated (see tests/isolation.py: the
assertions live unchanged in ``train_suite.py``; every observed jax-CPU
SIGABRT landed in this module's region before isolation)."""

from isolation import run_module_isolated


def test_train_module_isolated():
    run_module_isolated("train_suite.py")
