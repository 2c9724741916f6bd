#!/usr/bin/env python
"""Train the fully-convolutional autoencoder (CLI parity with the reference
``train_autoencoder.py``)."""

from qaig_tpu.cli.train_autoencoder import main  # noqa: F401


if __name__ == "__main__":
    main()
