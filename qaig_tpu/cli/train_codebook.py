"""Train a SOM codebook (CLI parity with the reference
``train_codebook.py``)."""

import argparse
import pathlib

from qaig_tpu.cli._args import add_runtime_args

from qaig_tpu.train import codebook


def main():
    parser = argparse.ArgumentParser(description="Train Codebook.")
    parser.add_argument("--device", choices=["auto", "cpu", "tpu", "cuda"],
                        type=str, default="auto")
    parser.add_argument("--dataset-path", required=True, type=pathlib.Path)
    parser.add_argument("--decoder-path", required=True, type=pathlib.Path)
    parser.add_argument("--codebook-path", required=False, type=pathlib.Path)
    parser.add_argument("--auto-resume", action="store_true",
                        help="Fault recovery: continue from the newest "
                             "codebook checkpoint in --out-dir (weights + "
                             "neighbourhood range + step counter); starts "
                             "fresh when none exists. Explicit "
                             "--codebook-path wins.")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--checkpoint-step", type=int, default=1_000)
    parser.add_argument("--lr-step", type=int, default=100_000)
    parser.add_argument("--max-epoch", type=int, default=1_000)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--debug-nans", action="store_true",
                        help="Enable jax_debug_nans (fail at the faulty op).")
    parser.add_argument("--profile-dir", default=None, type=pathlib.Path,
                        help="Capture a jax.profiler trace window here.")
    parser.add_argument("--profile-start", type=int, default=5)
    parser.add_argument("--profile-steps", type=int, default=5)
    parser.add_argument("-c", "--config-path", required=True,
                        type=pathlib.Path)
    parser.add_argument("--log-every", type=int, default=1,
                        help="Sync loss to host every N steps (1 = reference behavior).")
    parser.add_argument("--num-model-shards", type=int, default=1,
                        help="Tensor-parallel shards over the mesh's model "
                             "axis (1 = pure data parallel).")
    parser.add_argument("--keep-checkpoints", type=int, default=None,
                        help="Retention: keep only the N newest checkpoints "
                             "in --out-dir, pruning older ones after each "
                             "successful save (default: keep all, like the "
                             "reference).")
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
    codebook.run(args)


if __name__ == "__main__":
    main()
