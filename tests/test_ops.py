"""Unit tests for core ops: patchify order, pos-emb values, attention math."""

import math

import numpy as np
import jax.numpy as jnp

from qaig_tpu.ops import patchify, unpatchify, sinusoidal_pos_emb
from qaig_tpu.ops.attention import dot_product_attention


def patchify_oracle(x, ph, pw):
    """Loop-based oracle: patches row-major over the grid, each flattened in
    (C, ph, pw) order — the index contract the codebook tokens rely on."""
    n, c, h, w = x.shape
    out = np.zeros((n, (h // ph) * (w // pw), c * ph * pw), x.dtype)
    for b in range(n):
        s = 0
        for i in range(h // ph):
            for j in range(w // pw):
                patch = x[b, :, i * ph:(i + 1) * ph, j * pw:(j + 1) * pw]
                out[b, s] = patch.reshape(-1)
                s += 1
    return out


def test_patchify_matches_oracle(rng):
    x = rng.standard_normal((2, 3, 8, 12)).astype(np.float32)
    got = np.asarray(patchify(jnp.asarray(x), (2, 4)))
    want = patchify_oracle(x, 2, 4)
    np.testing.assert_array_equal(got, want)


def test_unpatchify_roundtrip(rng):
    x = rng.standard_normal((3, 4, 16, 16)).astype(np.float32)
    p = patchify(jnp.asarray(x), (4, 4))
    back = unpatchify(p, image_dim=(16, 16), patch_dim=(4, 4))
    np.testing.assert_array_equal(np.asarray(back), x)


def test_pos_emb_values():
    emb_dim, positions = 8, np.array([0, 1, 5, 100], np.float32)
    got = np.asarray(sinusoidal_pos_emb(emb_dim, jnp.asarray(positions)))
    half = emb_dim // 2
    freqs = np.exp(np.arange(half) * -(math.log(10000.0) / (half - 1)))
    ang = positions[:, None] * freqs[None, :]
    want = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
    # position 0 must embed to [0,0,..,1,1,..]
    np.testing.assert_allclose(got[0, :half], 0.0)
    np.testing.assert_allclose(got[0, half:], 1.0)


def attention_oracle(q, k, v, heads, causal):
    n, sq, d = q.shape
    sk = k.shape[1]
    dh = d // heads
    out = np.zeros_like(q)
    for b in range(n):
        for h in range(heads):
            qh = q[b, :, h * dh:(h + 1) * dh]
            kh = k[b, :, h * dh:(h + 1) * dh]
            vh = v[b, :, h * dh:(h + 1) * dh]
            scores = qh @ kh.T / math.sqrt(dh)
            if causal:
                for i in range(sq):
                    scores[i, i + 1:] = -np.inf
            w = np.exp(scores - scores.max(axis=-1, keepdims=True))
            w /= w.sum(axis=-1, keepdims=True)
            out[b, :, h * dh:(h + 1) * dh] = w @ vh
    return out


def test_attention_matches_oracle(rng):
    n, s, d, heads = 2, 7, 16, 4
    q = rng.standard_normal((n, s, d)).astype(np.float32)
    k = rng.standard_normal((n, s, d)).astype(np.float32)
    v = rng.standard_normal((n, s, d)).astype(np.float32)
    for causal in (False, True):
        got = np.asarray(dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads,
            causal=causal))
        want = attention_oracle(q, k, v, heads, causal)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_kv_mask_equals_truncation(rng):
    """Masked-out trailing keys must behave exactly like a shorter k/v."""
    n, sq, sk, d, heads = 2, 3, 9, 8, 2
    valid = 5
    q = rng.standard_normal((n, sq, d)).astype(np.float32)
    k = rng.standard_normal((n, sk, d)).astype(np.float32)
    v = rng.standard_normal((n, sk, d)).astype(np.float32)
    kv_mask = np.zeros((n, sk), bool)
    kv_mask[:, :valid] = True
    got = np.asarray(dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads,
        kv_mask=jnp.asarray(kv_mask)))
    want = np.asarray(dot_product_attention(
        jnp.asarray(q), jnp.asarray(k[:, :valid]), jnp.asarray(v[:, :valid]),
        heads))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_q_offset_matches_full_causal(rng):
    """Decode-step semantics: query at absolute offset o attends keys <= o."""
    n, s, d, heads = 1, 6, 8, 2
    x = rng.standard_normal((n, s, d)).astype(np.float32)
    full = np.asarray(dot_product_attention(
        jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), heads, causal=True))
    for o in range(s):
        step = np.asarray(dot_product_attention(
            jnp.asarray(x[:, o:o + 1]), jnp.asarray(x), jnp.asarray(x),
            heads, causal=True, q_offset=o))
        np.testing.assert_allclose(step[:, 0], full[:, o], atol=1e-5)
