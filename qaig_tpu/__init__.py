"""qaig_tpu — TPU-native quantized-autoregression image generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Vinmwaura/Quantized-Autoregression-Image-Generator (reference mounted at
/root/reference): a fully-convolutional autoencoder, SOM-style codebooks that
discretize patchified latents, a cascade of DiT-flavored transformers over the
token sequences, and an autoregressive decode engine that generates images
coarse-to-fine.

Design stance (TPU-first, not a port):
  * all compute paths are jit-compiled XLA with static shapes,
  * convolutions run NHWC on the MXU,
  * the codebook BMU search is a fused Pallas kernel (patchify + L2 argmin),
  * autoregressive decode is a KV-cached ``lax.scan`` (the reference re-runs
    the full window per token),
  * multi-chip scaling goes through ``jax.sharding.Mesh`` + jit sharding
    annotations (data parallel + optional tensor parallel).
"""

__version__ = "0.1.0"

from qaig_tpu import ops  # noqa: F401
