#!/usr/bin/env python
"""Serve cascade generation over HTTP (load once, serve many).

Extension beyond the reference (which only has the ``generate_images.py``
batch CLI): wraps :class:`qaig_tpu.infer.pipeline.CascadePipeline` in
:class:`qaig_tpu.serve.GenerationServer`.  Same staged ``--config-path``
JSON as ``generate_images.py``.
"""

from qaig_tpu.cli.serve_generation import main  # noqa: F401


if __name__ == "__main__":
    main()
