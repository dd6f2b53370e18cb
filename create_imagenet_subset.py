#!/usr/bin/env python
"""Checkout shim — the subset tool lives in
:mod:`mcm_tpu.cli.create_subset`; a wheel install exposes it as the
``mcm-create-imagenet-subset`` entry point."""

from mcm_tpu.cli.create_subset import main  # noqa: F401

if __name__ == "__main__":
    main()
