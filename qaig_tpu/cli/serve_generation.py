"""Serve cascade generation over HTTP (load once, serve many).

Extension beyond the reference (which only has the ``generate_images.py``
batch CLI): wraps :class:`qaig_tpu.infer.pipeline.CascadePipeline` in
:class:`qaig_tpu.serve.GenerationServer`.  Same staged ``--config-path``
JSON as ``generate_images.py``.
"""

import argparse
import pathlib

from qaig_tpu.cli._args import add_runtime_args


def main():
    parser = argparse.ArgumentParser(description="Serve image generation.")
    parser.add_argument("--device", choices=["auto", "cpu", "tpu", "cuda"],
                        type=str, default="auto")
    parser.add_argument("--decoder-path", required=True, type=pathlib.Path)
    parser.add_argument("--config-path", required=True, type=pathlib.Path)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max-batch", type=int, default=64)
    parser.add_argument("--bf16", action="store_true",
                        help="Serve in bfloat16 (the benchmark precision).")
    parser.add_argument("--shard-batch", action="store_true",
                        help="Shard each request's image batch over all "
                             "visible chips (params replicated).  Requests "
                             "must then ask for a multiple of the chip "
                             "count (400 otherwise).")
    parser.add_argument("--num-model-shards", type=int, default=1,
                        help="Tensor-parallel shards for each stage "
                             "transformer's weights (Megatron MLP "
                             "sharding; for models too large for one "
                             "chip).  Implies a mesh even without "
                             "--shard-batch.")
    parser.add_argument("--use-ema", action="store_true",
                        help="Serve the EMA weights (model_ema, written by "
                             "training under --ema-decay).")
    parser.add_argument("--max-queue-rows", type=int, default=None,
                        help="Backpressure bound: reject (503) once this "
                             "many image rows wait in the dispatch queue "
                             "(default: 8 x max-batch; floor: max-batch so "
                             "any admissible request can queue on an idle "
                             "server).")
    parser.add_argument("--request-timeout", type=float, default=None,
                        help="Bound each request's queue wait in seconds "
                             "(504 on expiry; in-flight dispatches always "
                             "complete). Default: wait forever.")
    parser.add_argument("--warmup-batch", type=int, default=0,
                        help="Compile the pipeline for this batch size "
                             "before accepting traffic (0 = lazy).")
    add_runtime_args(parser, multihost=False)
    args = parser.parse_args()

    from qaig_tpu.train import common
    common.select_platform(args.device, args.compiler_options)
    common.apply_compilation_cache(vars(args))

    import jax
    import jax.numpy as jnp
    from qaig_tpu.infer.pipeline import CascadePipeline
    from qaig_tpu.serve import GenerationServer

    mesh = None
    batch_multiple = 1
    n_model = max(1, args.num_model_shards)
    if args.shard_batch or n_model > 1:
        from qaig_tpu.parallel.mesh import make_mesh
        n_chips = len(jax.devices())
        if n_chips % n_model != 0:
            raise SystemExit(f"--num-model-shards {n_model} must divide "
                             f"the chip count ({n_chips})")
        batch_multiple = n_chips // n_model if args.shard_batch else 1
        mesh = make_mesh(n_data=batch_multiple, n_model=n_model)
        print(f"serving over {n_chips} chips: data={batch_multiple} "
              f"x model={n_model}"
              + (f" (num_images must be a multiple of {batch_multiple})"
                 if batch_multiple > 1 else ""))

    def build_pipeline():
        # re-read the config too, so a reload picks up both new checkpoint
        # bytes and updated checkpoint paths inside the same config file
        pipe = CascadePipeline.from_config(
            common.load_config(args.config_path), args.decoder_path,
            mesh=mesh, dtype=jnp.bfloat16 if args.bf16 else None,
            use_ema=args.use_ema)
        if args.warmup_batch > 0:
            # also runs during POST /reload (old weights keep serving), so
            # the swapped-in pipeline never serves a cold compile
            pipe.generate(args.warmup_batch, seed=0)
            print(f"warmed up at batch {args.warmup_batch}", flush=True)
        return pipe

    # NOTE: no local keeps the startup pipeline alive — after POST /reload
    # swaps in fresh weights, the only reference to the old pipeline is the
    # batcher's, so the old device buffers free and reloads stay a
    # *transient* 2x-HBM peak rather than a permanent one.
    server = GenerationServer(build_pipeline(), host=args.host,
                              port=args.port,
                              max_batch=args.max_batch,
                              batch_multiple=batch_multiple,
                              max_queue_rows=args.max_queue_rows,
                              request_timeout=args.request_timeout,
                              reloader=build_pipeline)
    print(f"serving on http://{args.host}:{server.port}", flush=True)

    # Graceful drain on SIGTERM/SIGINT (rolling restarts): stop accepting,
    # finish the in-flight dispatch and everything already queued, exit 0.
    # The handler only flips a plain flag (no locks — Event.set() from a
    # signal handler can deadlock against Event.wait() on the same thread);
    # the sleep below is interrupted by the signal, so shutdown is prompt.
    import signal
    import time
    stop_flag = {"stop": False}

    def _on_signal(*_):
        stop_flag["stop"] = True

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _on_signal)
    server.start(background=True)
    while not stop_flag["stop"]:
        time.sleep(0.2)
    print("shutting down: draining queued requests...", flush=True)
    server.stop()
    print("drained; bye.", flush=True)


if __name__ == "__main__":
    main()
