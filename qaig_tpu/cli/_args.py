"""Flags shared by every stage CLI (one definition; the stage modules call
:func:`add_runtime_args` instead of repeating the block)."""

import pathlib


def add_runtime_args(parser, multihost=True):
    """Multihost coordination + the persistent compilation cache."""
    if multihost:
        parser.add_argument(
            "--multihost", action="store_true",
            help="Join a multi-host slice via jax.distributed.initialize().")
        parser.add_argument(
            "--coordinator-address", default=None, type=str,
            help="host:port of process 0 (multihost; TPU pods auto-detect "
                 "when omitted).")
        parser.add_argument("--num-processes", default=None, type=int)
        parser.add_argument("--process-id", default=None, type=int)
    parser.add_argument(
        "--compilation-cache-dir", default=None, type=pathlib.Path,
        help="Persist XLA compilations here across process restarts (jax "
             "persistent cache): later runs with the same shapes skip "
             "compilation.")
