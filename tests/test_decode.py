"""KV-cached decode must agree with the teacher-forcing forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qaig_tpu.models.transformer import Transformer, TransformerConfig


def _small_cfg(**kw):
    base = dict(use_encoder=False, use_pos_cond=False, num_enc_layers=1,
                num_dec_layers=2, num_enc_embedding=8, num_dec_embedding=16,
                self_attn_heads=2, cross_attn_heads=2, in_dim=16, out_dim=12,
                hidden_dim=32)
    base.update(kw)
    return TransformerConfig(**base)


@pytest.mark.parametrize("use_encoder", [False, True])
def test_cached_decode_matches_full_forward(rng, use_encoder):
    cfg = _small_cfg(use_encoder=use_encoder)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0))

    n, seq = 2, 9
    tokens = jnp.asarray(rng.integers(0, cfg.num_dec_embedding, (n, seq)))
    x_enc = (jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 4)))
             if use_encoder else None)

    full = model.apply(params, tokens, x_enc=x_enc)  # (N, S, out)

    cross_kv = None
    if use_encoder:
        enc_out = model.encode(params, x_enc)
        cross_kv = model.make_cross_kv(params, enc_out)

    caches = model.init_cache(n, seq)

    # prefill on the first 3 tokens, then step the rest one-by-one
    prefix = 3
    logits, caches = model.prefill(params, tokens[:, :prefix], caches,
                                   cross_kv=cross_kv)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full[:, prefix - 1]), atol=1e-4)

    for i in range(prefix, seq):
        logits, caches = model.decode_step(
            params, tokens[:, i], caches, jnp.asarray(i), cross_kv=cross_kv)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[:, i]), atol=1e-4,
                                   err_msg=f"step {i}")


def test_window_forward_matches_apply(rng):
    cfg = _small_cfg(use_encoder=True, use_pos_cond=True)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(1))

    n, seq = 2, 6
    tokens = jnp.asarray(rng.integers(0, cfg.num_dec_embedding, (n, seq)))
    x_enc = jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 4)))
    pos_cond = jnp.asarray(rng.integers(0, 40, (n, seq)))

    want = model.apply(params, tokens, x_enc=x_enc, pos_cond=pos_cond)

    enc_out = model.encode(params, x_enc)
    cross_kv = model.make_cross_kv(params, enc_out)
    got = model.window_forward(params, tokens, pos_cond=pos_cond,
                               cross_kv=cross_kv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
