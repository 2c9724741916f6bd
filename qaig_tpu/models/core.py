"""Parameter primitives: linear / conv / norm init + apply.

Pure-functional style: every primitive is an ``init_*`` returning a param
pytree (nested dicts of jnp arrays) plus an ``apply`` function.  Explicit
param trees keep jit/pjit/scan and the KV-cached decode engine simple, and
make tolerant checkpoint restore + torch-checkpoint import purely mechanical.

Initializer parity: the reference relies on PyTorch defaults
(kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias), so the same distributions are used here to match training
dynamics.  Layout conventions are JAX-native: dense kernels are (in, out),
conv kernels HWIO, and all conv compute runs NHWC for the MXU.
"""

import math

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------

def init_linear(rng, in_dim, out_dim, zero_weight=False):
    """Torch-parity Linear init.  ``zero_weight`` covers the AdaLN-Zero
    Scale/Shift layers (reference ``models/layers.py:100-126``) which zero the
    weight but keep the default-initialised bias."""
    k_rng, b_rng = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_dim)
    if zero_weight:
        w = jnp.zeros((in_dim, out_dim), dtype=jnp.float32)
    else:
        w = jax.random.uniform(
            k_rng, (in_dim, out_dim), jnp.float32, -bound, bound)
    b = jax.random.uniform(b_rng, (out_dim,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def linear(params, x, activation=None):
    y = x @ params["w"] + params["b"]
    if activation is not None:
        y = activation(y)
    return y


def init_mlp2(rng, in_dim, hidden_dim, out_dim):
    """Two stacked linears (activation handling is the caller's business —
    the reference uses act-on-first-only for Q/K/V and classifier blocks, and
    act-on-both for the transformer FFN)."""
    r0, r1 = jax.random.split(rng)
    return {
        "l0": init_linear(r0, in_dim, hidden_dim),
        "l1": init_linear(r1, hidden_dim, out_dim),
    }


def mlp2(params, x, act, act_last=False):
    h = linear(params["l0"], x, activation=act)
    return linear(params["l1"], h, activation=act if act_last else None)


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------

_LN_EPS = 1e-5  # torch nn.LayerNorm default.


def layer_norm(x, eps=_LN_EPS):
    """Affine-free layer norm over the trailing axis (statistics in f32 for
    bf16 streams, result cast back to the input dtype)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)


def init_layer_norm(dim):
    return {"g": jnp.ones((dim,), jnp.float32),
            "b": jnp.zeros((dim,), jnp.float32)}


def affine_layer_norm(params, x, eps=_LN_EPS):
    return layer_norm(x, eps) * params["g"] + params["b"]


# ---------------------------------------------------------------------------
# Convolutions (NHWC / HWIO)
# ---------------------------------------------------------------------------

_CONV_DN = ("NHWC", "HWIO", "NHWC")


def init_conv(rng, in_ch, out_ch, kernel_size=3):
    k_rng, b_rng = jax.random.split(rng)
    fan_in = in_ch * kernel_size * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(
        k_rng, (kernel_size, kernel_size, in_ch, out_ch), jnp.float32,
        -bound, bound)
    b = jax.random.uniform(b_rng, (out_ch,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def conv2d(params, x, stride=1, padding=1, activation=None):
    """3x3-style conv on NHWC input."""
    y = lax.conv_general_dilated(
        x, params["w"],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_CONV_DN)
    y = y + params["b"]
    if activation is not None:
        y = activation(y)
    return y


def init_conv_transpose(rng, in_ch, out_ch, kernel_size=4):
    """Kernel stored HWIO, pre-flipped: apply is a plain correlation over the
    zero-dilated input.  Torch-parity init (ConvTranspose2d fan_in counts the
    *output* channels because of its (in, out, kH, kW) weight layout)."""
    k_rng, b_rng = jax.random.split(rng)
    fan_in = out_ch * kernel_size * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(
        k_rng, (kernel_size, kernel_size, in_ch, out_ch), jnp.float32,
        -bound, bound)
    b = jax.random.uniform(b_rng, (out_ch,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def conv_transpose2d(params, x, stride=2, padding=1, kernel_size=4,
                     activation=None):
    """Fractionally-strided conv == correlation of the (stride-1)-zero-dilated
    input with the stored kernel, padded by (kernel_size - 1 - padding).

    Matches torch ``ConvTranspose2d(k=4, s=2, p=1)`` output shape (2x
    upsample) and values when the kernel is imported spatially flipped.
    """
    pad = kernel_size - 1 - padding
    y = lax.conv_general_dilated(
        x, params["w"],
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_CONV_DN)
    y = y + params["b"]
    if activation is not None:
        y = activation(y)
    return y


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------

def init_embedding(rng, num_embeddings, dim):
    """Torch nn.Embedding default: N(0, 1)."""
    return {"w": jax.random.normal(rng, (num_embeddings, dim), jnp.float32)}


def embedding_lookup(params, indices):
    return jnp.take(params["w"], indices, axis=0)
