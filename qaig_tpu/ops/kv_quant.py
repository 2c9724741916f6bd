"""int8 KV-cache quantization (per-slot symmetric amax scaling).

Serving option for the beam-decode hot path: the shared prefix K/V — the
dominant HBM stream of the rollout decode — is stored int8 with one bf16
scale per (batch, head, slot), halving the bytes read every generated
token.  Caches are stored TRANSPOSED (N, H, dh, S) (see
``ops.attention.transpose_heads_t``), so quantization reduces over the dh
axis and scales are dense (N, H, S) lane vectors.  The decode attention
folds the scales into the f32 score matrix / softmax probabilities — no
dequantized copy of the cache ever materializes (in XLA via
``shared_prefix_attention``'s scale arguments, or fully in-kernel via
``ops.decode_attention.shared_prefix_attention_fused_int8``).
"""

import jax.numpy as jnp

_EPS = 1e-8


def quantize_kv_t(x_t):
    """Transposed cache (..., dh, S) float -> (int8 values, (..., S) bf16
    per-slot scales)."""
    xf = x_t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-2)               # (..., S)
    scale = amax / 127.0
    q = jnp.clip(jnp.round(xf / jnp.maximum(scale[..., None, :], _EPS)),
                 -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.bfloat16)


def dequantize_kv_t(q, scale, dtype=jnp.bfloat16):
    """Inverse of :func:`quantize_kv_t` (tests / debugging; the decode path
    never materializes this)."""
    return q.astype(dtype) * scale[..., None, :].astype(dtype)


def quantize_caches(caches):
    """Per-layer transposed {'k','v'} caches -> int8 + per-slot scales."""
    out = []
    for c in caches:
        k8, ks = quantize_kv_t(c["k"])
        v8, vs = quantize_kv_t(c["v"])
        out.append({"k": k8, "v": v8, "k_scale": ks, "v_scale": vs})
    return out


def dequantize_caches(caches, dtype=jnp.bfloat16):
    out = []
    for c in caches:
        if "k_scale" not in c:
            out.append(c)
            continue
        out.append({"k": dequantize_kv_t(c["k"], c["k_scale"], dtype),
                    "v": dequantize_kv_t(c["v"], c["v_scale"], dtype)})
    return out
