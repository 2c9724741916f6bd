"""Fused attention kernel vs the einsum path (interpret mode on CPU),
forward and gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from qaig_tpu.ops.attention import dot_product_attention
from qaig_tpu.ops.flash_attention import flash_attention


def _data(rng, n=2, s=16, d=128):
    q = jnp.asarray(rng.standard_normal((n, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((n, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, s, d)), jnp.float32)
    return q, k, v


def test_flash_forward_matches_einsum(rng):
    q, k, v = _data(rng)
    for causal in (False, True):
        want = dot_product_attention(q, k, v, heads=2, causal=causal)
        got = flash_attention(q, k, v, heads=2, causal=causal,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_flash_causal_padding_path(rng):
    """Odd sequence lengths go through the tail-padding path."""
    q, k, v = _data(rng, s=13)
    want = dot_product_attention(q, k, v, heads=2, causal=True)
    got = flash_attention(q, k, v, heads=2, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_gradients_match_einsum(rng):
    q, k, v = _data(rng, s=8)

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, heads=2,
                                             causal=True) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, heads=2, causal=True,
                                       interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for gr, gf, name in zip(g_ref, g_flash, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-5, err_msg=f"d{name}")
