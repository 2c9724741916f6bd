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
    parser.add_argument(
        "--compiler-options", default=None, type=str,
        help="Comma-separated XLA compiler options attached to every "
             "jitted program, e.g. "
             "'xla_tpu_scoped_vmem_limit_kib=65536'.  The per-compile "
             "channel is the only one that reaches the TPU compiler "
             "through a remote-backend relay (local XLA_FLAGS parsing "
             "rejects TPU-only flags there).  Also settable via the "
             "QAIG_COMPILER_OPTIONS environment variable.")
