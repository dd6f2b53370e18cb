#!/usr/bin/env python
"""Checkout shim for drop-in compatibility with the reference's
``python eval_ood_detection.py ...`` invocation (and existing launch
scripts).  The CLI lives in :mod:`mcm_tpu.cli.eval_ood`; a wheel install
exposes it as the ``mcm-eval-ood`` entry point."""

from mcm_tpu.cli.eval_ood import (build_parser, main,  # noqa: F401
                                  process_args)

if __name__ == "__main__":
    main()
