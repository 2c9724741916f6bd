#!/usr/bin/env python
"""Serving-concurrency benchmark: coalesced vs serial dispatch.

Measures what the RequestBatcher (qaig_tpu/serve.py) buys on real
hardware: N concurrent 1-image requests served as ONE padded cascade
dispatch vs N sequential solo dispatches.  Uses the bench-scale cascade
(bench.py::build_cascade, random weights — serving cost does not depend
on weight values) and the REAL batcher, so the number reflects the
product path minus HTTP framing (a few ms/request, measured in round 2).

Prints one JSON line:
  {"serial_s": ..., "coalesced_s": ..., "speedup": ...,
   "n_requests": N, "images_per_sec_coalesced": ...}
"""

import argparse
import json
import sys
import threading
import time

sys.path.insert(0, ".")  # repo root (bench.py)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-requests", type=int, default=8)
    parser.add_argument("--scale", choices=["full", "smoke"], default="full")
    parser.add_argument("--device", choices=["auto", "cpu", "tpu"],
                        default="auto")
    args = parser.parse_args()

    if args.device != "auto":
        import jax
        jax.config.update("jax_platforms",
                          "cpu" if args.device == "cpu" else "tpu")
    import jax.numpy as jnp

    from bench import build_cascade
    from qaig_tpu.infer.pipeline import CascadePipeline, CascadeStage
    from qaig_tpu.serve import RequestBatcher

    stages_raw, decoder, dec_params = build_cascade(
        scale=args.scale, dtype=jnp.bfloat16)
    stages = [
        CascadeStage(
            model=s["model"], params=s["params"], engine=s["engine"],
            lr_codebook=s["lr"][0], lr_params=s["lr"][1],
            hr_codebook=s["hr"][0], hr_params=s["hr"][1],
            settings=s["settings"], num_beam=s["num_beam"],
            beam_width=s["beam_width"], sliding_window=s["window"],
            total_seq=s["total_seq"], is_base=s["base"])
        for s in stages_raw
    ]
    pipeline = CascadePipeline(stages, decoder, dec_params)
    batcher = RequestBatcher(pipeline, max_batch=64, batch_multiple=1)

    n = args.n_requests
    # Warm the two programs the measurement uses: the solo size-1 dispatch
    # and the coalesced size-n bucket (full cascades are slow to compile;
    # warming every intermediate bucket would double the wall time for no
    # measurement value).
    pipeline.generate(1, seed=0)
    pipeline.generate(batcher._bucket(n), seed=0)

    # serial: one request at a time (the round-2 lock behavior)
    t0 = time.perf_counter()
    for i in range(n):
        batcher.submit(1, seed=i)
    serial_s = time.perf_counter() - t0

    # concurrent: enqueue all n under the batcher's lock (what n racing
    # clients converge to once the device is busy), so the dispatcher
    # drains them as ONE padded batch — the steady-state coalescing path.
    items = [{"num": 1, "seed": i, "event": threading.Event(),
              "result": None, "error": None} for i in range(n)]
    t0 = time.perf_counter()
    with batcher._cv:
        batcher._pending.extend(items)
        batcher._cv.notify()
    for item in items:
        item["event"].wait()
    coalesced_s = time.perf_counter() - t0
    assert all(item["error"] is None and
               item["result"][0].shape[0] == 1 for item in items)

    batcher.stop()
    print(json.dumps({
        "serial_s": round(serial_s, 4),
        "coalesced_s": round(coalesced_s, 4),
        "speedup": round(serial_s / coalesced_s, 2),
        "n_requests": n,
        "images_per_sec_coalesced": round(n / coalesced_s, 2),
    }))


if __name__ == "__main__":
    main()
