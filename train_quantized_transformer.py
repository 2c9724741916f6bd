#!/usr/bin/env python
"""Train the quantized transformer (CLI parity with the reference
``train_quantized_transformer.py``)."""

from qaig_tpu.cli.train_quantized_transformer import main, restricted_float  # noqa: F401


if __name__ == "__main__":
    main()
