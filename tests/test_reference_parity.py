"""End-to-end numerical parity against the actual reference implementation.

These tests only run where the reference checkout is mounted (CI without it
skips them).  For each model: build the torch reference module with random
init, import its state_dict through ``qaig_tpu.utils.torch_compat``, and
compare forward outputs on random inputs.  This simultaneously validates the
model math and the pretrained-checkpoint import path.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference checkout not available")
torch = pytest.importorskip("torch")

if str(REFERENCE) not in sys.path:
    sys.path.insert(0, str(REFERENCE))

from qaig_tpu.models.conv_nets import (AutoencoderConfig, Autoencoder,
                                       ConvNetConfig, FCEncoder, FCDecoder)
from qaig_tpu.models.codebook import Codebook
from qaig_tpu.models.transformer import Transformer, TransformerConfig
from qaig_tpu.utils.torch_compat import load_torch_into

import jax


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_fc_encoder_parity(rng):
    from models.FC_Encoder import FC_Encoder as RefEncoder
    torch.manual_seed(0)
    ref = RefEncoder(num_layers=2, image_channel=3, min_channel=8,
                     max_channel=32, latent_channel=4,
                     hidden_activation_type="silu",
                     use_final_activation=True, final_activation_type="tanh")
    ref.eval()

    cfg = ConvNetConfig(num_layers=2, image_channel=3, min_channel=8,
                        max_channel=32, latent_channel=4)
    ours = FCEncoder(cfg)
    params = ours.init(jax.random.PRNGKey(0))
    params = load_torch_into(ours, params, _np_sd(ref))

    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 4, 4, 4)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fc_decoder_parity(rng):
    from models.FC_Decoder import FC_Decoder as RefDecoder
    torch.manual_seed(1)
    ref = RefDecoder(num_layers=2, image_channel=3, min_channel=8,
                     max_channel=32, latent_channel=4,
                     hidden_activation_type="silu",
                     use_final_activation=True, final_activation_type="tanh")
    ref.eval()

    cfg = ConvNetConfig(num_layers=2, image_channel=3, min_channel=8,
                        max_channel=32, latent_channel=4)
    ours = FCDecoder(cfg)
    params = ours.init(jax.random.PRNGKey(1))
    params = load_torch_into(ours, params, _np_sd(ref))

    z = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(z)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(z)))
    assert got.shape == want.shape == (2, 3, 16, 16)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_autoencoder_parity(rng):
    from models.Autoencoder import Autoencoder as RefAE
    torch.manual_seed(2)
    ref = RefAE(num_layers=1, image_channel=3, min_channel=8, max_channel=16,
                latent_channel=2)
    ref.eval()

    cfg = AutoencoderConfig(num_layers=1, image_channel=3, min_channel=8,
                            max_channel=16, latent_channel=2)
    ours = Autoencoder(cfg)
    params = ours.init(jax.random.PRNGKey(2))
    params = load_torch_into(ours, params, _np_sd(ref))

    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_codebook_parity(rng):
    from models.Codebook import Codebook as RefCodebook
    torch.manual_seed(3)
    ref = RefCodebook(patch_dim=(2, 2), image_dim=(8, 8), image_channel=4,
                      num_embeddings=32, init_neighbour_range=16)
    ref.eval()

    ours = Codebook(patch_dim=(2, 2), image_dim=(8, 8), image_channel=4,
                    num_embeddings=32, init_neighbour_range=16)
    params = ours.init(jax.random.PRNGKey(3))
    params = load_torch_into(ours, params, _np_sd(ref))

    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    xt = torch.from_numpy(x)
    xj = jnp.asarray(x)

    with torch.no_grad():
        want_bmu = ref.get_patches_bmu(xt, reshape=True).numpy()
        want_soft = ref.get_quantized_patches(xt, use_gaussian=True).numpy()
        want_hard = ref.get_quantized_patches(xt, use_gaussian=False).numpy()
        want_img = ref(xt, use_gaussian=True).numpy()

    got_bmu = np.asarray(ours.get_patches_bmu(params, xj, reshape=True))
    np.testing.assert_array_equal(got_bmu, want_bmu)

    got_soft = np.asarray(ours.get_quantized_patches(params, xj))
    np.testing.assert_allclose(got_soft, want_soft, atol=1e-5)

    got_hard = np.asarray(ours.get_quantized_patches(params, xj,
                                                     use_gaussian=False))
    np.testing.assert_allclose(got_hard, want_hard, atol=1e-6)

    got_img = np.asarray(ours.apply(params, xj))
    np.testing.assert_allclose(got_img, want_img, atol=1e-5)

    # quantized-image lookup path
    idx = rng.integers(0, 32, (2, 16))
    with torch.no_grad():
        want_q = ref.get_quantized_image(torch.from_numpy(idx),
                                         unpatchify_input=True).numpy()
    got_q = np.asarray(ours.get_quantized_image(params, jnp.asarray(idx)))
    np.testing.assert_allclose(got_q, want_q, atol=1e-6)


def test_autoencoder_psnr_parity(rng):
    """BASELINE.md quality metric: reconstruction PSNR parity.  The same
    weights must reconstruct the same pixels on both frameworks to fp noise
    (>= 50 dB between the two reconstructions over the [-1, 1] range)."""
    from models.Autoencoder import Autoencoder as RefAE
    torch.manual_seed(11)
    kwargs = dict(num_layers=2, image_channel=3, min_channel=16,
                  max_channel=64, latent_channel=4)
    ref = RefAE(**kwargs)
    ref.eval()

    ours = Autoencoder(AutoencoderConfig(**kwargs))
    params = ours.init(jax.random.PRNGKey(11))
    params = load_torch_into(ours, params, _np_sd(ref))

    x = rng.uniform(-1, 1, (4, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_recon = ref(torch.from_numpy(x)).numpy()
    our_recon = np.asarray(ours.apply(params, jnp.asarray(x)))

    mse = np.mean((ref_recon - our_recon) ** 2)
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))  # peak-to-peak 2.0
    assert psnr >= 50.0, f"PSNR parity too low: {psnr:.1f} dB"


def _transformer_pair(base_mode, seed=4):
    from models.Transformer import Transformer as RefTransformer
    torch.manual_seed(seed)
    kwargs = dict(
        use_encoder=not base_mode,
        use_pos_cond=not base_mode,
        num_enc_layers=2,
        num_dec_layers=2,
        num_enc_embedding=16,
        num_dec_embedding=24,
        self_attn_heads=4,
        cross_attn_heads=4,
        transformer_in_dim=32,
        transformer_out_dim=20,
        transformer_hidden_dim=64,
        hidden_activation="silu")
    ref = RefTransformer(**kwargs)
    ref.eval()

    cfg = TransformerConfig(
        use_encoder=not base_mode,
        use_pos_cond=not base_mode,
        num_enc_layers=2,
        num_dec_layers=2,
        num_enc_embedding=16,
        num_dec_embedding=24,
        self_attn_heads=4,
        cross_attn_heads=4,
        in_dim=32,
        out_dim=20,
        hidden_dim=64,
        hidden_activation="silu")
    ours = Transformer(cfg)
    params = ours.init(jax.random.PRNGKey(seed))
    params = load_torch_into(ours, params, _np_sd(ref))
    return ref, ours, params


def test_transformer_base_parity(rng):
    """Decoder-only, no position conditioning (base-model mode)."""
    ref, ours, params = _transformer_pair(base_mode=True)
    x_dec = rng.integers(0, 24, (2, 7))
    with torch.no_grad():
        want = ref(torch.from_numpy(x_dec)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x_dec)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_transformer_cascade_parity(rng):
    """Encoder-decoder with AdaLN pos conditioning (cascade mode)."""
    ref, ours, params = _transformer_pair(base_mode=False, seed=5)
    x_dec = rng.integers(0, 24, (2, 7))
    x_enc = rng.integers(0, 16, (2, 3))
    pos_cond = rng.integers(0, 50, (2, 7))
    with torch.no_grad():
        want = ref(torch.from_numpy(x_dec), x_enc=torch.from_numpy(x_enc),
                   pos_cond=torch.from_numpy(pos_cond)).numpy()
    got = np.asarray(ours.apply(params, jnp.asarray(x_dec),
                                x_enc=jnp.asarray(x_enc),
                                pos_cond=jnp.asarray(pos_cond)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)
