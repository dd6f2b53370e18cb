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
