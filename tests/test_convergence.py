"""Convergence (not just loss-decrease) on structured data.

The reference's de-facto correctness artifact is its trained sample grids
(``/root/reference/README.md:32-51``); ``scripts/quality_run.py`` is this
framework's full-scale counterpart (see QUALITY.md).  These tests are the
CI-sized version: on a small structured dataset the AE must reach a real
reconstruction PSNR (not merely "loss went down"), and codebook
quantized PSNR must improve across checkpoints.
"""

import pathlib
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "scripts"))

pytestmark = pytest.mark.slow


def _structured_batches(tmp_path, n_train=16, n_eval=8, size=32):
    from quality_run import make_dataset
    from qaig_tpu.data.image_dataset import ImageDataset

    manifest, _ = make_dataset(tmp_path, n_train + n_eval, seed=7, size=size)
    ds = ImageDataset(manifest)
    imgs = np.stack([ds[i] for i in range(len(ds))])
    return (jnp.asarray(imgs[:n_train]), jnp.asarray(imgs[n_train:]))


def _psnr(a, b):
    from eval_quality import psnr_db
    return float(psnr_db(a, b))


@pytest.fixture(scope="module")
def trained_ae(tmp_path_factory):
    """AE trained to convergence on 16 structured 32px images (shared by
    both tests; the codebook trains on its latents)."""
    from qaig_tpu.train.autoencoder import build_autoencoder, make_train_step
    from qaig_tpu.train.optim import make_adam

    tmp_path = tmp_path_factory.mktemp("conv")
    train, heldout = _structured_batches(tmp_path)
    model, _ = build_autoencoder({
        "model_lr": 3e-3, "image_channel": 3, "min_channel": 16,
        "max_channel": 32, "num_layers": 1, "latent_channel": 4,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh"})
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_adam(3e-3, 10_000)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer)

    first_psnr = None
    rng = np.random.default_rng(0)
    for i in range(400):
        idx = rng.permutation(train.shape[0])[:8]
        params, opt_state, _ = step(params, opt_state, train[idx])
        if i == 0:
            first_psnr = _psnr(heldout, jax.jit(model.apply)(params, heldout))
    return model, params, train, heldout, first_psnr


def test_autoencoder_converges_to_real_psnr(trained_ae):
    """Held-out recon PSNR after 400 steps: >= 21 dB absolute and >= 8 dB
    above the untrained first step (structured shapes dataset — trivially
    memorizable noise would not prove generalization)."""
    model, params, _, heldout, first_psnr = trained_ae
    final = _psnr(heldout, jax.jit(model.apply)(params, heldout))
    assert final >= 21.0, (first_psnr, final)
    assert final >= first_psnr + 8.0, (first_psnr, final)


def test_codebook_quantized_psnr_improves_over_checkpoints(trained_ae):
    """Quantized-recon PSNR (AE recon through BMU-quantized latents) must
    improve from the first to the last of 4 checkpoints, and land within
    striking distance of the unquantized recon."""
    from qaig_tpu.models.codebook import Codebook
    from qaig_tpu.train.codebook import make_train_step
    from qaig_tpu.train.optim import make_adam

    model, ae_params, train, heldout, _ = trained_ae
    latents = jax.jit(model.get_latent)(ae_params, train)

    cb = Codebook(patch_dim=(2, 2), image_dim=latents.shape[2:],
                  image_channel=latents.shape[1], num_embeddings=64,
                  init_neighbour_range=32)
    cb_params = cb.init(jax.random.PRNGKey(1))
    optimizer = make_adam(1e-2, 10_000)
    opt_state = optimizer.init(cb_params)
    step = make_train_step(cb, optimizer)

    def quantized_psnr(cbp):
        def f(cbp, aep, x):
            z = model.get_latent(aep, x)
            tokens = cb.get_patches_bmu(cbp, z, reshape=True)
            return model.recon_image(aep, cb.get_quantized_image(cbp, tokens))
        return _psnr(heldout, jax.jit(f)(cbp, ae_params, heldout))

    # the reference anneals the neighbourhood from K/2 toward 1; 4
    # checkpoints across the anneal
    ckpt_psnrs = [quantized_psnr(cb_params)]
    rng = np.random.default_rng(0)
    neigh = 32.0
    for ck in range(4):
        for _ in range(60):
            idx = rng.permutation(latents.shape[0])[:8]
            cb_params, opt_state, _ = step(cb_params, opt_state,
                                           latents[idx], jnp.asarray(neigh))
            neigh = max(1.0, neigh - 0.25)
        ckpt_psnrs.append(quantized_psnr(cb_params))

    unquantized = _psnr(heldout, jax.jit(model.apply)(ae_params, heldout))
    assert ckpt_psnrs[-1] > ckpt_psnrs[0] + 3.0, ckpt_psnrs
    assert ckpt_psnrs[-1] >= unquantized - 8.0, (ckpt_psnrs, unquantized)
