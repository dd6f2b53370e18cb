"""Subprocess isolation for mesh-heavy test modules.

jax 0.9's CPU runtime intermittently SIGABRTs in the device-to-host of a
sharded array once a process has compiled many mesh/sharding variants
(CLAUDE.md; reduced but not eliminated by disabling async dispatch).  Any
module that compiles a pile of mesh programs and reads sharded outputs
back is in the blast radius — running it in a subprocess keeps one jaxlib
abort from killing the whole suite, and the KNOWN abort (SIGABRT) is
retried, while genuine test failures surface immediately with no retry.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SIGABRT_CODES = (-6, 134)  # signal form and shell-style 128+6


def run_module_isolated(suite_file: str, timeout: int = 1200,
                        retries: int = 2) -> None:
    cmd = [sys.executable, "-m", "pytest",
           os.path.join(HERE, suite_file), "-q",
           "-p", "no:cacheprovider"]
    proc = None
    for _ in range(retries + 1):
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              cwd=os.path.dirname(HERE), timeout=timeout)
        if proc.returncode == 0:
            return
        if proc.returncode not in SIGABRT_CODES:
            break  # real failure: report it, don't retry
        # Same gate as scripts/run_tests.sh: only the KNOWN jaxlib crash
        # (its banner in the output) is retried — a repo-caused abort()
        # also exits -6/134, and retrying that into a green would ship
        # the bug (review finding, round 5).
        if "Fatal Python error: Aborted" not in (
                (proc.stdout or "") + (proc.stderr or "")):
            break
    raise AssertionError(
        f"{suite_file} failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}")
