#!/usr/bin/env python
"""Reconstruction-quality evaluation over an image dataset.

The reference verifies training quality *visually* (periodic image dumps,
``train_codebook.py:252-268``); this tool puts numbers on the same
question: mean PSNR of (a) the autoencoder reconstruction and (b) the
hard-quantized reconstruction through each given codebook (encode ->
BMU tokens -> codebook lookup -> decode), over a dataset.  Pixel space is
the reference's BGR [-1, 1] convention, so peak-to-peak is 2.0 —
matching the PSNR-parity test in
``tests/test_reference_parity.py::test_autoencoder_psnr_parity``.

Prints one JSON line:
  {"num_images": N, "psnr_recon_db": ...,
   "psnr_quantized_db": {"<ckpt>": ...}, ...}
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def psnr_db(clean, recon, peak=2.0):
    """Per-image PSNR, averaged; inputs (N, C, H, W) in [-1, 1]."""
    err = (np.asarray(clean, np.float64)
           - np.asarray(recon, np.float64)) ** 2
    mse = err.reshape(err.shape[0], -1).mean(axis=1)
    return float(np.mean(10.0 * np.log10(peak * peak
                                         / np.maximum(mse, 1e-12))))


def main():
    parser = argparse.ArgumentParser(
        description="Dataset-level reconstruction PSNR.")
    parser.add_argument("--device", choices=["auto", "cpu", "tpu", "cuda"],
                        default="auto")
    parser.add_argument("--dataset-path", required=True, type=pathlib.Path)
    parser.add_argument("--model-path", required=True, type=pathlib.Path,
                        help="Autoencoder checkpoint.")
    parser.add_argument("--codebook-path", action="append", default=[],
                        type=pathlib.Path,
                        help="Codebook checkpoint(s); repeatable.  Each "
                             "adds a quantized-reconstruction PSNR.")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--max-images", type=int, default=None)
    args = parser.parse_args()

    from qaig_tpu.train import common
    common.select_platform(args.device)

    import jax
    import jax.numpy as jnp

    from qaig_tpu.data.image_dataset import ImageDataset
    from qaig_tpu.data.loader import DataLoader
    from qaig_tpu.utils import load_model

    status, ckpt = load_model(str(args.model_path))
    if not status:
        raise RuntimeError("Could not load autoencoder checkpoint!")
    ae, ae_params, _ = common.autoencoder_from_checkpoint(ckpt)

    codebooks = []
    for path in args.codebook_path:
        status, cb_ckpt = load_model(str(path))
        if not status:
            raise RuntimeError(f"Could not load codebook checkpoint {path}!")
        cb, cb_params = common.codebook_from_checkpoint(cb_ckpt)
        codebooks.append((str(path), cb, cb_params))

    recon_fn = jax.jit(ae.apply)
    latent_fn = jax.jit(ae.get_latent)
    decode_fn = jax.jit(ae.recon_image)

    def quantize_fn(cb):
        def f(cb_params, z):
            tokens = cb.get_patches_bmu(cb_params, z, reshape=True)
            return cb.get_quantized_image(cb_params, tokens)
        return jax.jit(f)

    quant_fns = [(name, quantize_fn(cb), cb_params)
                 for name, cb, cb_params in codebooks]

    dataset = ImageDataset(str(args.dataset_path))
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False,
                        drop_remainder=False)

    n_done = 0
    recon_psnrs, quant_psnrs = [], {name: [] for name, _, _ in quant_fns}
    weights = []
    for batch in loader:
        batch = jnp.asarray(batch)
        if args.max_images is not None:
            batch = batch[:max(args.max_images - n_done, 0)]
            if batch.shape[0] == 0:
                break
        recon_psnrs.append(psnr_db(batch, recon_fn(ae_params, batch)))
        if quant_fns:
            z = latent_fn(ae_params, batch)
            for name, qf, cb_params in quant_fns:
                quant_psnrs[name].append(
                    psnr_db(batch, decode_fn(ae_params, qf(cb_params, z))))
        weights.append(batch.shape[0])
        n_done += int(batch.shape[0])
        if args.max_images is not None and n_done >= args.max_images:
            break

    w = np.asarray(weights, np.float64)
    result = {
        "num_images": n_done,
        "psnr_recon_db": round(float(np.average(recon_psnrs, weights=w)), 3),
        "psnr_quantized_db": {
            name: round(float(np.average(vals, weights=w)), 3)
            for name, vals in quant_psnrs.items()},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
