"""Reference-artifact formats (log file, KDE plot) + telemetry accounting.

The log filename/format and plot filename are part of the reference's
observable output surface (``utils/file_ops.py:17-28``,
``utils/plot_util.py:11-15``) — they get direct tests, not just
existence checks through the CLI suite.
"""

import logging
import os
import re
import time

import numpy as np


def test_setup_log_reference_format(tmp_path):
    from mcm_tpu.utils.logging import setup_log
    d = str(tmp_path)
    log = setup_log(d, "fmt_test")
    log.debug("hello world")
    path = os.path.join(d, "ood_eval_info.log")
    lines = open(path).read().splitlines()
    # reference format: "%(asctime)s : %(message)s", DEBUG level, and the
    # setup banner first
    assert lines[0].endswith("#########fmt_test############")
    assert re.match(r"\d{4}-\d{2}-\d{2} .* : hello world$", lines[1])
    assert log.level == logging.DEBUG

    # mode='w': a second setup truncates (reference semantics) and must not
    # duplicate handlers (each message logged exactly once)
    log = setup_log(d, "fmt_test")
    log.debug("second run")
    content = open(path).read()
    assert "hello world" not in content
    assert content.count("second run") == 1


def test_plot_distribution_writes_reference_filename(tmp_path):
    from mcm_tpu.utils.plotting import plot_distribution
    rng = np.random.default_rng(0)
    path = plot_distribution(str(tmp_path), "MCM", "dtd",
                             rng.uniform(-1, -0.5, 64),
                             rng.uniform(-0.6, 0, 64))
    assert os.path.basename(path) == "MCM_dtd.png"  # {score}_{out_dataset}
    assert os.path.getsize(path) > 1000  # a real PNG, not a stub


def test_telemetry_stages_and_report():
    from mcm_tpu.utils.telemetry import Telemetry
    tel = Telemetry()
    time.sleep(0.01)  # startup time before the loop's first stage
    with tel.stage("h2d"):
        time.sleep(0.01)
    with tel.stage("h2d"):
        pass
    tel.add_images(7)
    assert tel.stage_counts["h2d"] == 2
    assert tel.stage_seconds["h2d"] >= 0.01
    # loop clock starts at the first stage, excluding startup
    assert tel.loop_wall < tel.wall
    assert tel.images == 7 and tel.images_per_sec > 0
    rep = tel.report()
    assert "images: 7" in rep and "h2d" in rep and "× 2" in rep


def test_maybe_profile_writes_trace(tmp_path):
    """--trace_dir plumbing: a jitted op under maybe_profile leaves a JAX
    profiler artifact in the directory (best-effort contract: on backends
    without profiler support it must warn, not raise)."""
    import warnings

    import jax
    import jax.numpy as jnp

    from mcm_tpu.utils.telemetry import maybe_profile

    trace_dir = str(tmp_path / "trace")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        with maybe_profile(trace_dir):
            jnp.asarray(jax.jit(lambda x: x * 2)(jnp.ones(8))).sum()
    if any("profiler unavailable" in str(w.message) for w in caught):
        # the no-fail contract held — but accept it ONLY when the
        # profiler genuinely can't start here: a regression inside
        # maybe_profile (e.g. a typo'd import caught by its own
        # best-effort except) would otherwise warn its way past the
        # trace assertion forever (review finding, round 5)
        import pytest
        with pytest.raises(Exception):
            with jax.profiler.trace(str(tmp_path / "direct")):
                pass
        return  # unsupported backend, confirmed independently
    found = [os.path.join(dp, f) for dp, _, fs in os.walk(trace_dir)
             for f in fs]
    assert found, "profiler reported success but wrote no trace files"


def test_maybe_profile_none_is_noop(tmp_path):
    from mcm_tpu.utils.telemetry import maybe_profile
    with maybe_profile(None):
        pass
    with maybe_profile(""):
        pass
