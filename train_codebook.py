#!/usr/bin/env python
"""Train a SOM codebook (CLI parity with the reference
``train_codebook.py``)."""

from qaig_tpu.cli.train_codebook import main  # noqa: F401


if __name__ == "__main__":
    main()
