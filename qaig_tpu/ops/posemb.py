"""Sinusoidal positional embeddings.

Parity target: reference ``models/layers.py:83-96`` — frequencies are
``exp(arange(half) * -log(10000)/(half-1))`` and the output is
``concat(sin, cos)`` along the feature axis.  Positions may be arbitrary
(non-contiguous) indices; the sliding-window conditioning path feeds absolute
patch positions here.
"""

import math

import jax.numpy as jnp


def sinusoidal_pos_emb(emb_dim, pos_index):
    """Sinusoidal embedding of shape ``pos_index.shape + (emb_dim,)``.

    ``pos_index`` may be any integer/float array; the embedding is computed
    along a new trailing axis (sin half then cos half).
    """
    half_dim = emb_dim // 2
    exponent = math.log(10_000.0) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -exponent)

    angles = pos_index.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
