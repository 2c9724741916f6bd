"""SOM-style codebook: patchified-latent quantization.

Capability parity with reference ``models/Codebook.py:17-164``:

* best-matching-unit (BMU) search = L2 argmin of each patch against all
  codes,
* soft ("Gaussian") quantization spreads each patch over codes whose
  *embedding index* is near the BMU index — a 1-D Gaussian in index space
  with variance ``-(range / (2 ln 0.1))`` (``Codebook.py:109-130``) — giving
  the SOM neighbourhood pull,
* hard quantization is a plain code lookup,
* ``decrease_neighbourhood`` shrinks the range by 1 per call, floored at 1.

TPU-native design: the BMU argmin is computed from the expanded quadratic
form (``||w||^2 - 2 x.w`` — the ``||x||^2`` term cannot change the argmin and
is dropped), so the hot op is one (M, D) @ (D, K) matmul on the MXU; a fused
Pallas patchify+BMU kernel (``qaig_tpu.ops.bmu``) takes over for large
batches.  Gradients flow exactly as in the reference: BMU indices carry no
gradient, the soft-quantize matmul carries d/d(codebook).
"""

import math

import jax
import jax.numpy as jnp

from qaig_tpu.ops.bmu import bmu_argmin
from qaig_tpu.ops.patch import patchify, unpatchify


class Codebook:
    def __init__(self,
                 patch_dim=(2, 2),
                 image_dim=(32, 32),
                 image_channel=4,
                 num_embeddings=512,
                 init_neighbour_range=256):
        if init_neighbour_range > num_embeddings and init_neighbour_range < 1:
            raise ValueError("Invalid value for init_neighbour_range.")
        self.neighbourhood_range = init_neighbour_range

        self.patch_dim = tuple(patch_dim)
        self.image_dim = tuple(image_dim)
        self.image_channel = image_channel
        patch_h, patch_w = self.patch_dim
        self.embedding_dim = image_channel * patch_h * patch_w
        self.num_embeddings = num_embeddings

    @property
    def seq_len(self):
        h, w = self.image_dim
        ph, pw = self.patch_dim
        return (h // ph) * (w // pw)

    def init(self, rng):
        """U(-1/K, 1/K) init (reference ``Codebook.py:41-46``)."""
        bound = 1.0 / self.num_embeddings
        codes = jax.random.uniform(
            rng, (self.num_embeddings, self.embedding_dim), jnp.float32,
            -bound, bound)
        return {"codebook": codes}

    def decrease_neighbourhood(self, steps=1):
        if steps < 1:
            raise ValueError("Invalid value for steps, should be >= 1.")
        self.neighbourhood_range = (
            1.0 if self.neighbourhood_range <= 1
            else self.neighbourhood_range - 1)

    # -- BMU search ---------------------------------------------------------

    def get_patches_bmu(self, params, x, reshape=False):
        """(N, C, H, W) -> flat (N*Seq,) BMU indices (or (N, Seq) when
        ``reshape``)."""
        x_patches = patchify(x, patch_dim=self.patch_dim)
        n, seq, d = x_patches.shape
        flat = x_patches.reshape(n * seq, d)
        bmu = bmu_argmin(flat, params["codebook"])
        if reshape:
            bmu = bmu.reshape(n, seq)
        return bmu

    # -- quantization -------------------------------------------------------

    def get_quantized_patches(self, params, x, use_gaussian=True,
                              neighbourhood_range=None):
        codes = params["codebook"]
        bmu = self.get_patches_bmu(params, x)  # (N*Seq,)
        bmu = jax.lax.stop_gradient(bmu)
        n = x.shape[0]

        if use_gaussian:
            if neighbourhood_range is None:
                neighbourhood_range = self.neighbourhood_range
            scale = gaussian_neighbourhood(
                bmu, self.num_embeddings, neighbourhood_range)
            quantized = scale @ codes  # (N*Seq, K) @ (K, D)
        else:
            quantized = jnp.take(codes, bmu, axis=0)

        return quantized.reshape(n, -1, self.embedding_dim)

    def get_quantized_image(self, params, indices, unpatchify_input=True):
        n, seq = indices.shape
        quantized = jnp.take(params["codebook"], indices.reshape(-1), axis=0)
        quantized = quantized.reshape(n, seq, self.embedding_dim)
        if unpatchify_input:
            return unpatchify(quantized, image_dim=self.image_dim,
                              patch_dim=self.patch_dim)
        return quantized

    def apply(self, params, x, use_gaussian=True, neighbourhood_range=None):
        """Quantize + unpatchify (reference ``Codebook.py:156-164``)."""
        quantized = self.get_quantized_patches(
            params, x, use_gaussian=use_gaussian,
            neighbourhood_range=neighbourhood_range)
        return unpatchify(quantized, image_dim=self.image_dim,
                          patch_dim=self.patch_dim)


def gaussian_neighbourhood(bmu, num_embeddings, neighbourhood_range):
    """(M, K) SOM neighbourhood weights: 1-D Gaussian over embedding-index
    distance from the BMU (reference ``Codebook.py:109-125``)."""
    variance = -(neighbourhood_range / (2.0 * math.log(0.1)))
    idx = jnp.arange(num_embeddings, dtype=jnp.float32)[None, :]
    delta = idx - bmu.astype(jnp.float32)[:, None]
    return jnp.exp(-(delta * delta) / (2.0 * variance))
