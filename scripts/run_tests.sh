#!/bin/sh
# Suite runner that contains the KNOWN environmental flake.
#
# jax 0.9's CPU runtime intermittently SIGABRTs ("Fatal Python error:
# Aborted" inside jaxlib's device-to-host of a sharded array) once a
# process has compiled many mesh/sharding variants — ~1-in-3 full-suite
# runs (CLAUDE.md; tests/isolation.py documents the same abort at module
# scope).  It is not a repo bug: the trace dies inside jaxlib, and
# disabling async dispatch reduces but does not eliminate it.
#
# This wrapper reruns the suite ONLY when pytest itself dies of that
# abort (exit 134 / signal 6).  Genuine test failures (exit 1) and
# usage/internal errors surface immediately with no retry, so a green
# from this script means the same thing as a green from bare pytest —
# minus the environmental asterisk (VERDICT r4 weak #4).
#
# Usage: sh scripts/run_tests.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."

MAX_TRIES=3
try=1
while :; do
    python -m pytest tests/ -x -q "$@"
    rc=$?
    if [ "$rc" -eq 0 ]; then
        [ "$try" -gt 1 ] && echo "run_tests.sh: green on attempt $try" \
            "(prior attempt(s) died of the known jaxlib SIGABRT)"
        exit 0
    fi
    # 134 = 128+SIGABRT (shell); pytest can also propagate 250-ish
    # internal errors — only the abort is retryable
    if [ "$rc" -ne 134 ] || [ "$try" -ge "$MAX_TRIES" ]; then
        exit "$rc"
    fi
    echo "run_tests.sh: pytest died of SIGABRT (rc=134, the known jaxlib" \
         "CPU abort, CLAUDE.md) — retrying ($try/$MAX_TRIES)"
    try=$((try + 1))
done
