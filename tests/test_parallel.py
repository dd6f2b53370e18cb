"""Sharded-eval tests, subprocess-isolated (see tests/isolation.py: the
assertions live unchanged in ``parallel_suite.py``; this wrapper contains
the jax-CPU SIGABRT blast radius of a module that compiles many mesh
variants and reads sharded outputs back)."""

from isolation import run_module_isolated


def test_parallel_module_isolated():
    run_module_isolated("parallel_suite.py")
