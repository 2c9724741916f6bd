#!/usr/bin/env python
"""Prune under-utilized codebook entries (CLI parity with the reference
``prune_codebook.py``)."""

from qaig_tpu.cli.prune_codebook import main  # noqa: F401


if __name__ == "__main__":
    main()
