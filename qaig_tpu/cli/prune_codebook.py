"""Prune under-utilized codebook entries (CLI parity with the reference
``prune_codebook.py``)."""

import argparse
import pathlib

from qaig_tpu.cli._args import add_runtime_args

from qaig_tpu.train import prune


def main():
    parser = argparse.ArgumentParser(description="Train Prune Codebook.")
    parser.add_argument("--device", choices=["auto", "cpu", "tpu", "cuda"],
                        type=str, default="auto")
    parser.add_argument("--dataset-path", required=True, type=pathlib.Path)
    parser.add_argument("--codebook-path", required=True, type=pathlib.Path)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--prune-threshold", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--checkpoint-backend",
                        choices=["pickle", "orbax", "orbax-async"],
                        default="pickle",
                        help="pickle = reference-compatible single file; "
                             "orbax = sharded directory (no host gather); "
                             "orbax-async = sharded + the disk commit "
                             "overlaps training.")
    add_runtime_args(parser)
    parser.add_argument("--out-dir", required=True, type=pathlib.Path)
    args = vars(parser.parse_args())
    prune.run(args)


if __name__ == "__main__":
    main()
