"""Stage logging: simultaneous file + stream handlers.

Format parity with the reference training scripts
(``train_autoencoder.py:162-171``): ``%(asctime)s %(message)s`` to both
``<out>/<project>.log`` and stderr.
"""

import logging
import os


def setup_logging(out_dir, project_name):
    log_path = os.path.join(str(out_dir), f"{project_name}.log")
    handlers = [logging.FileHandler(log_path), logging.StreamHandler()]
    logging.basicConfig(
        format="%(asctime)s %(message)s",
        handlers=handlers,
        level=logging.INFO,
        force=True)
    return logging.getLogger(project_name)
