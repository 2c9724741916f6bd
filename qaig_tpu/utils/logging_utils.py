"""Stage logging: simultaneous file + stream handlers.

Format parity with the reference training scripts
(``train_autoencoder.py:162-171``): ``%(asctime)s %(message)s`` to both
``<out>/<project>.log`` and stderr.
"""

import logging
import os


def setup_logging(out_dir, project_name, main_process=True):
    """``main_process=False`` (multihost replicas) keeps the stream handler
    but skips the shared log file so processes don't interleave writes."""
    handlers = [logging.StreamHandler()]
    if main_process:
        log_path = os.path.join(str(out_dir), f"{project_name}.log")
        handlers.insert(0, logging.FileHandler(log_path))
    logging.basicConfig(
        format="%(asctime)s %(message)s",
        handlers=handlers,
        level=logging.INFO,
        force=True)
    return logging.getLogger(project_name)
