"""CLI argparse contracts: every entry point parses --help (catches import
or flag breakage without running the stages)."""

import subprocess
import sys

import pytest

CLIS = [
    "train_autoencoder.py",
    "generate_fmap_dataset.py",
    "train_codebook.py",
    "prune_codebook.py",
    "train_quantized_transformer.py",
    "generate_images.py",
]


@pytest.mark.parametrize("cli", CLIS)
def test_cli_help(cli):
    result = subprocess.run(
        [sys.executable, cli, "--help"],
        capture_output=True, text=True, timeout=120, cwd=".")
    assert result.returncode == 0, result.stderr[-500:]
    assert "--out-dir" in result.stdout
