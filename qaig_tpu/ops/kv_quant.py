"""int8 KV-cache quantization (per-slot symmetric amax scaling).

Serving option for the beam-decode hot path: the shared prefix K/V — the
dominant HBM stream of the rollout decode — is stored int8 with one bf16
scale per (batch, head, slot), halving the bytes read every generated
token.  Measured on TPU v5e at bench stage-2 shapes: 7-layer attention step
1.18 -> 1.02 ms (XLA materializes the dequantized operand rather than
fusing it into the dot, so the net is ~13%, not 2x); max |output| error vs
bf16 ~0.02 on unit-variance inputs.  Exact bf16 caches stay the default.
"""

import jax.numpy as jnp

_EPS = 1e-8


def quantize_kv(x):
    """(..., dh) float -> (int8 values, (..., 1) bf16 scales)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = amax / 127.0
    q = jnp.clip(jnp.round(xf / jnp.maximum(scale, _EPS)), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.bfloat16)


def dequantize_kv(q, scale, dtype=jnp.bfloat16):
    return q.astype(dtype) * scale.astype(dtype)


def quantize_caches(caches):
    """Per-layer {'k','v'} bf16 caches -> {'k','v','k_scale','v_scale'}."""
    out = []
    for c in caches:
        k8, ks = quantize_kv(c["k"])
        v8, vs = quantize_kv(c["v"])
        out.append({"k": k8, "v": v8, "k_scale": ks, "v_scale": vs})
    return out


def dequantize_caches(caches, dtype=jnp.bfloat16):
    out = []
    for c in caches:
        if "k_scale" not in c:
            out.append(c)
            continue
        out.append({"k": dequantize_kv(c["k"], c["k_scale"], dtype),
                    "v": dequantize_kv(c["v"], c["v_scale"], dtype)})
    return out
