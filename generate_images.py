#!/usr/bin/env python
"""Generate images through the transformer cascade (CLI parity with the
reference ``generate_images.py``)."""

from qaig_tpu.cli.generate_images import main  # noqa: F401


if __name__ == "__main__":
    main()
