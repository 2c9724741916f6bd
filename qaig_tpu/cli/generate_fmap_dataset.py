"""Generate the cached feature-map dataset (CLI parity with the reference
``generate_fmap_dataset.py``)."""

import argparse
import pathlib

from qaig_tpu.cli._args import add_runtime_args

from qaig_tpu.train import fmap


def main():
    parser = argparse.ArgumentParser(
        description="Generate Feature Maps Dataset.")
    parser.add_argument("--device", choices=["auto", "cpu", "tpu", "cuda"],
                        type=str, default="auto")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--num-files-folder", type=int, default=1_000)
    parser.add_argument("--dataset-path", required=True, type=pathlib.Path)
    parser.add_argument("--model-path", required=True, type=pathlib.Path)
    add_runtime_args(parser)
    parser.add_argument("--out-dir", required=True, type=pathlib.Path)
    args = vars(parser.parse_args())
    fmap.run(args)


if __name__ == "__main__":
    main()
