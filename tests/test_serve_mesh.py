"""Mesh-bound serving tests, subprocess-isolated (see tests/isolation.py;
assertions live unchanged in ``serve_mesh_suite.py``)."""

from isolation import run_module_isolated


def test_serve_mesh_module_isolated():
    run_module_isolated("serve_mesh_suite.py")
