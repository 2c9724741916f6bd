#!/usr/bin/env python
"""Per-stage TPU throughput ledger for the NON-transformer pipeline stages.

``bench.py`` covers the headline cascade decode and ``scripts/
bench_train.py`` the transformer train step; this tool measures the three
hot loops the r3 ledger had no TPU numbers for (SURVEY §3):

  (a) autoencoder train step  — reference ``train_autoencoder.py:198-280``
      (conv fwd/bwd + Adam), fp32 and --bf16, at reference-README shapes
      (128x128x3 images, 256->512 channels, latent 32x32x4);
  (b) feature-map extraction  — ``generate_fmap_dataset.py:19-74``
      (encoder forward, images/sec);
  (c) codebook train step     — ``train_codebook.py:216-304`` (cdist BMU +
      Gaussian soft-quantize + Adam) at the README codebook configs
      (K=512 over 32x32x4 latents; patch 8x8 and the heaviest 2x2).

Prints ONE JSON line: {"stages": {...}} with per-stage step time (mean +
95% CI over --iters), samples/sec/chip, and MFU where XLA reports FLOPs.
Device dispatch is timed the same way bench.py times the cascade (scalar
fetch forces execution through the axon relay).
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def _timed(fn, args_fn, iters):
    """Mean/CI over ``iters`` timed calls of an already-compiled fn."""
    from bench import ci95_half_width
    out = fn(*args_fn(0))
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      .astype(jnp.float32)))  # warm result fetch
    times = []
    for i in range(iters):
        a = args_fn(i + 1)
        t0 = time.time()
        out = fn(*a)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                          .astype(jnp.float32)))
        times.append(time.time() - t0)
    times = np.asarray(times)
    ci = ci95_half_width(times)
    return float(times.mean()), (float(ci) if ci is not None else None)


def _mfu(compiled, mean_t):
    from bench import compiled_flops, peak_flops_per_chip
    flops = compiled_flops(compiled)
    peak, kind = peak_flops_per_chip()
    if flops and peak:
        return round((flops / mean_t) / peak, 4), flops
    return None, flops


def bench_ae(batch, iters, bf16):
    """(a) AE train step at reference-README shapes."""
    from qaig_tpu.train import optim
    from qaig_tpu.train.autoencoder import build_autoencoder, make_train_step

    cfg_dict = {"model_lr": 1e-4, "image_channel": 3, "min_channel": 256,
                "max_channel": 512, "num_layers": 2, "latent_channel": 4,
                "hidden_activation_type": "silu",
                "use_final_enc_activation": True,
                "encoder_activation_type": "tanh",
                "use_final_dec_activation": True,
                "decoder_activation_type": "tanh"}
    model, _ = build_autoencoder(cfg_dict)
    optimizer = optim.make_adam(1e-4, 10_000)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, bf16=bf16)

    rng = np.random.default_rng(0)
    batch_x = jnp.asarray(rng.standard_normal((batch, 3, 128, 128)),
                          jnp.float32)
    lowered = step.lower(params, opt_state, batch_x)
    compiled = lowered.compile()
    state = {"p": params, "o": opt_state}

    def call(p, o, b):
        new_p, new_o, loss = compiled(p, o, b)
        state["p"], state["o"] = new_p, new_o
        return loss

    mean_t, ci = _timed(lambda b: call(state["p"], state["o"], b),
                        lambda i: (batch_x,), iters)
    mfu, flops = _mfu(compiled, mean_t)
    return {"step_time_mean_s": round(mean_t, 5),
            "step_time_ci95_s": round(ci, 5) if ci else None,
            "images_per_sec": round(batch / mean_t, 2),
            "batch": batch, "precision": "bf16" if bf16 else "fp32",
            "mfu": mfu,
            "flops_per_step": round(flops) if flops else None}


def bench_fmap(batch, iters):
    """(b) encoder forward (feature-map extraction), images/sec."""
    from qaig_tpu.train.autoencoder import build_autoencoder

    cfg_dict = {"model_lr": 1e-4, "image_channel": 3, "min_channel": 256,
                "max_channel": 512, "num_layers": 2, "latent_channel": 4,
                "hidden_activation_type": "silu",
                "use_final_enc_activation": True,
                "encoder_activation_type": "tanh",
                "use_final_dec_activation": True,
                "decoder_activation_type": "tanh"}
    model, _ = build_autoencoder(cfg_dict)
    params = model.init(jax.random.PRNGKey(0))
    enc = jax.jit(lambda p, x: model.get_latent(p, x))

    rng = np.random.default_rng(0)
    batch_x = jnp.asarray(rng.standard_normal((batch, 3, 128, 128)),
                          jnp.float32)
    lowered = enc.lower(params, batch_x)
    compiled = lowered.compile()
    mean_t, ci = _timed(compiled, lambda i: (params, batch_x), iters)
    mfu, flops = _mfu(compiled, mean_t)
    return {"step_time_mean_s": round(mean_t, 5),
            "step_time_ci95_s": round(ci, 5) if ci else None,
            "images_per_sec": round(batch / mean_t, 2),
            "batch": batch, "mfu": mfu,
            "flops_per_step": round(flops) if flops else None}


def bench_codebook(batch, iters, patch):
    """(c) codebook (SOM) train step at the README config: K=512 codes
    over 32x32x4 latents, ``patch`` x ``patch`` patches."""
    from qaig_tpu.models.codebook import Codebook
    from qaig_tpu.train import optim
    from qaig_tpu.train.codebook import make_train_step

    cb = Codebook(patch_dim=(patch, patch), image_dim=(32, 32),
                  image_channel=4, num_embeddings=512,
                  init_neighbour_range=256)
    optimizer = optim.make_adam(1e-4, 10_000)
    params = cb.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    step = make_train_step(cb, optimizer)

    rng = np.random.default_rng(0)
    batch_x = jnp.asarray(rng.standard_normal((batch, 4, 32, 32)),
                          jnp.float32)
    nr = jnp.asarray(64.0, jnp.float32)
    lowered = step.lower(params, opt_state, batch_x, nr)
    compiled = lowered.compile()
    state = {"p": params, "o": opt_state}

    def call(b):
        new_p, new_o, loss = compiled(state["p"], state["o"], b, nr)
        state["p"], state["o"] = new_p, new_o
        return loss

    mean_t, ci = _timed(lambda b: call(b), lambda i: (batch_x,), iters)
    mfu, flops = _mfu(compiled, mean_t)
    return {"step_time_mean_s": round(mean_t, 5),
            "step_time_ci95_s": round(ci, 5) if ci else None,
            "samples_per_sec": round(batch / mean_t, 2),
            "batch": batch, "patch": patch,
            "tokens_per_image": (32 // patch) ** 2, "mfu": mfu,
            "flops_per_step": round(flops) if flops else None}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--ae-batch", type=int, default=32)
    parser.add_argument("--fmap-batch", type=int, default=64)
    parser.add_argument("--cb-batch", type=int, default=256)
    parser.add_argument("--only", choices=["ae", "fmap", "codebook"],
                        default=None)
    parser.add_argument("--device", choices=["auto", "cpu", "tpu", "cuda"],
                        default="auto")
    parser.add_argument("--compiler-options", default=None, type=str)
    args = parser.parse_args()
    from qaig_tpu.train.common import select_platform
    select_platform(args.device, args.compiler_options)

    if jax.default_backend() == "cpu":
        # keep CPU smoke runs fast: tiny batches, same code path
        args.ae_batch = min(args.ae_batch, 2)
        args.fmap_batch = min(args.fmap_batch, 4)
        args.cb_batch = min(args.cb_batch, 8)
        args.iters = min(args.iters, 2)

    stages = {}
    if args.only in (None, "ae"):
        stages["ae_train_fp32"] = bench_ae(args.ae_batch, args.iters,
                                           bf16=False)
        stages["ae_train_bf16"] = bench_ae(args.ae_batch, args.iters,
                                           bf16=True)
    if args.only in (None, "fmap"):
        stages["fmap_extract"] = bench_fmap(args.fmap_batch, args.iters)
    if args.only in (None, "codebook"):
        stages["codebook_train_p8"] = bench_codebook(args.cb_batch,
                                                     args.iters, patch=8)
        stages["codebook_train_p2"] = bench_codebook(args.cb_batch,
                                                     args.iters, patch=2)

    from bench import peak_flops_per_chip
    _, kind = peak_flops_per_chip()
    print(json.dumps({"device_kind": kind,
                      "n_chips": len(jax.devices()),
                      "iters": args.iters,
                      "stages": stages}))


if __name__ == "__main__":
    main()
