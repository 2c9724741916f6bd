#!/usr/bin/env python
"""Batch-1 interactive-latency attribution: dispatched vs fused cascade.

The reference's primary use is small interactive ``generate_images.py``
runs (``/root/reference/generate_images.py:256-337``).  Round 3 measured
the solo 1-image cascade at 2.8 s with no attribution; this probe breaks
it down on real hardware:

  - ``dispatched``: the per-segment loop (hundreds of sequential device
    programs, each paying a host->device round-trip),
  - ``fused``: the whole cascade as ONE jitted program
    (``CascadePipeline._fused_program``),
  - ``fused_stageK``: each cascade stage fused alone (where the on-device
    time actually goes),
  - ``fused_b8``: the fused program at batch 8, per-image (how much of the
    solo cost is 1-row tile waste vs fixed sequential-decode time).

Prints one JSON line with all of the above in seconds.
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, ".")  # repo root (bench.py)


def timed(fn, iters):
    """Each iteration forces execution with a scalar fetch —
    block_until_ready alone returns early under a remote-relay backend
    (same method as bench.py)."""
    import jax.numpy as jnp

    def force(x):
        leaf = x[0] if isinstance(x, tuple) else x
        return float(jnp.sum(leaf.astype(jnp.float32)))

    force(fn())  # warm/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        force(fn())
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--scale", choices=["full", "smoke"], default="full")
    parser.add_argument("--device", choices=["auto", "cpu", "tpu"],
                        default="auto")
    parser.add_argument("--skip-dispatched", action="store_true",
                        help="skip the slow per-segment baseline")
    args = parser.parse_args()

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from qaig_tpu.train.common import select_platform
    select_platform(args.device)  # relay-safe: 'tpu' keeps the env backend
    import jax
    import jax.numpy as jnp

    from bench import build_cascade
    from qaig_tpu.infer.pipeline import (CascadePipeline, CascadeStage,
                                         derive_row_keys)

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
    out = {"device": jax.devices()[0].device_kind, "iters": args.iters}

    # whole-cascade fused, batch 1 (the shipped interactive path)
    out["fused_s"] = round(timed(
        lambda: pipeline.generate(1, seed=0)[0], args.iters), 4)

    # per-stage attribution: each stage fused alone at batch 1.  Stage k>0
    # needs stage k-1's tokens; reuse the real ones so shapes/windows match.
    row_keys = jnp.asarray(derive_row_keys(0, 1))
    tokens = None
    for k, stage in enumerate(stages):
        import dataclasses

        def run_stage(sp, hr_params, keys, x_enc, stage=stage, k=k):
            gen_rng = jax.vmap(lambda kk: jax.random.fold_in(kk, k))(keys)
            if stage.is_base:
                from qaig_tpu.infer.pipeline import _INIT_TAG
                init_keys = jax.vmap(lambda kk: jax.random.fold_in(
                    kk, _INIT_TAG))(gen_rng)
                init = jax.vmap(lambda kk: jax.random.randint(
                    kk, (1,), 0, stage.lr_num_embeddings))(init_keys)
                x_enc = None
            else:
                init = jnp.full((1, 1), stage.hr_codebook.num_embeddings,
                                jnp.int32)
            res = stage.engine.rollout_generate(
                sp, init, stage.total_seq, gen_rng, stage.settings,
                num_beam=stage.num_beam, beam_width=stage.beam_width,
                x_enc=x_enc, sliding_window=stage.sliding_window)
            return res - stage.settings.index_shift

        fn = jax.jit(run_stage)
        x_enc = tokens
        out[f"fused_stage{k}_s"] = round(timed(
            lambda: fn(stage.params, stage.hr_params, row_keys, x_enc),
            args.iters), 4)
        tokens = fn(stage.params, stage.hr_params, row_keys, x_enc)

    # batch-8 fused, per image: separates fixed sequential-decode time from
    # 1-row tile waste (if per-image cost drops ~8x the solo cost was tile
    # waste; if it barely drops the decode is latency-bound, not tile-bound)
    out["fused_b8_s"] = round(timed(
        lambda: pipeline.generate(8, seed=0)[0], args.iters), 4)
    out["fused_b8_per_image_s"] = round(out["fused_b8_s"] / 8, 4)

    # the round-3 baseline: per-segment dispatched loop
    if not args.skip_dispatched:
        out["dispatched_s"] = round(timed(
            lambda: pipeline.generate(1, seed=0, fused=False)[0],
            max(1, args.iters // 2)), 4)
        out["speedup_fused_vs_dispatched"] = round(
            out["dispatched_s"] / out["fused_s"], 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
