#!/usr/bin/env python
"""Generate the cached feature-map dataset (CLI parity with the reference
``generate_fmap_dataset.py``)."""

from qaig_tpu.cli.generate_fmap_dataset import main  # noqa: F401


if __name__ == "__main__":
    main()
