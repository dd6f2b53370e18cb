#!/usr/bin/env python
"""Checkout shim — the MSP-baseline CLI lives in
:mod:`mcm_tpu.cli.eval_msp`; a wheel install exposes it as the
``mcm-eval-msp`` entry point."""

from mcm_tpu.cli.eval_msp import main, process_args  # noqa: F401

if __name__ == "__main__":
    main()
