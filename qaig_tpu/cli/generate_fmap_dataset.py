"""Generate the cached feature-map dataset (CLI parity with the reference
``generate_fmap_dataset.py``)."""

import argparse
import pathlib

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
    parser.add_argument("--multihost", action="store_true",
                        help="Join a multi-host slice via jax.distributed.initialize().")
    parser.add_argument("--coordinator-address", default=None, type=str,
                        help="host:port of process 0 (multihost; TPU pods "
                             "auto-detect when omitted).")
    parser.add_argument("--num-processes", default=None, type=int)
    parser.add_argument("--process-id", default=None, type=int)
    parser.add_argument("--compilation-cache-dir", default=None,
                        type=pathlib.Path,
                        help="Persist XLA compilations here across process "
                             "restarts (jax persistent cache): later runs "
                             "with the same shapes skip compilation.")
    parser.add_argument("--out-dir", required=True, type=pathlib.Path)
    args = vars(parser.parse_args())
    fmap.run(args)


if __name__ == "__main__":
    main()
