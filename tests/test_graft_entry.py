"""The driver contract hooks must keep working: entry() compiles and runs;
dryrun_multichip exercises the sharded train+eval step."""

import numpy as np


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (8,)
    assert np.isfinite(out).all()
    # MCM scores are in [-1, 0) by construction
    assert (out <= 0).all() and (out >= -1).all()


def test_dryrun_multichip_four_devices(capsys):
    import __graft_entry__ as g

    g.dryrun_multichip(4)
    assert "train loss" in capsys.readouterr().out


def test_dryrun_multichip_with_initialized_single_device_backend():
    """Reproduces the driver's round-1 failure mode: the caller has already
    initialized a JAX backend with fewer devices than requested.  The hook
    must re-exec with a forced device count instead of asserting."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # XLA_FLAGS is dropped unconditionally: any forced-device-count flag
    # would defeat the <8-device precondition the subprocess asserts
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [repo, env.get("PYTHONPATH", "")] if p)
    code = (
        "import jax; nd = len(jax.devices());"
        "assert nd < 8, f'precondition: expected <8 devices, got {nd}';"
        "import __graft_entry__ as g; g.dryrun_multichip(8)")
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert "train loss" in proc.stdout
