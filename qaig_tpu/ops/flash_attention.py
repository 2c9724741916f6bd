"""Pallas TPU kernel: fused (self-)attention forward.

Replaces the XLA einsum path for full-sequence attention (training forward,
prefill, windowed decode, encoder) at the reference's sequence scales
(S <= ~1k): per (batch, head) program the whole (S, S) score matrix lives in
VMEM — scores/softmax never round-trip HBM, which is where the XLA path
spends its bandwidth (N*H*S*S*4B twice).  Equivalent math to
``qaig_tpu.ops.attention.dot_product_attention`` (reference
``models/layers.py:444-468``).

Backward: custom VJP — standard XLA einsums from the saved (q, k, v, out)
residuals with the log-sum-exp recomputed (exact gradients, fused forward).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, causal, scale):
    q = q_ref[0].astype(jnp.float32)          # (S, dh)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (S, S)
    if causal:
        sq = s.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col <= row, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / l
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_fwd_core(q, k, v, causal, interpret):
    """(B, S, dh) f32/bf16 -> out (B, S, dh)."""
    b, s, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    kernel = functools.partial(_attn_kernel, causal=causal, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, dh), q.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * s * dh,
            bytes_accessed=3 * b * s * dh * 4 + b * s * dh * 4,
            transcendentals=b * s * s),
        interpret=interpret,
    )(q, k, v)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, causal, interpret):
    return _flash_fwd_core(q, k, v, causal, interpret)


def _flash_fwd(q, k, v, causal, interpret):
    out = _flash_fwd_core(q, k, v, causal, interpret)
    return out, (q, k, v, out)


def _flash_bwd(causal, interpret, res, dout):
    q, k, v, out = res
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    do = dout.astype(jnp.float32)
    of = out.astype(jnp.float32)

    s = jnp.einsum("bqd,bkd->bqk", qf, kf,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        sq = s.shape[1]
        mask = jnp.tril(jnp.ones((sq, sq), bool))
        s = jnp.where(mask[None], s, NEG_INF)
    lse = jax.scipy.special.logsumexp(s, axis=-1)  # recomputed, not saved
    p = jnp.exp(s - lse[:, :, None])

    dv = jnp.einsum("bqk,bqd->bkd", p, do)
    dp = jnp.einsum("bqd,bkd->bqk", do, vf)
    delta = jnp.sum(do * of, axis=-1, keepdims=True)   # (B, S, 1)
    ds = p * (dp - delta)
    dq = jnp.einsum("bqk,bkd->bqd", ds, kf) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, heads, causal=False, interpret=False):
    """Fused attention over projected (N, S, D) tensors; exact same contract
    as ``dot_product_attention`` for the self-attention case (Sq == Sk, no
    kv_mask).  Causal sequences are tail-padded to a sublane multiple (the
    causal mask hides padded keys from every real query)."""
    n, s, d = q.shape
    dh = d // heads

    pad = (-s) % 8
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    sp = s + pad

    def to_bh(x):
        return x.reshape(n, sp, heads, dh).transpose(0, 2, 1, 3).reshape(
            n * heads, sp, dh)

    out = _flash(to_bh(q), to_bh(k), to_bh(v), causal, interpret)
    out = out.reshape(n, heads, sp, dh).transpose(0, 2, 1, 3).reshape(
        n, sp, d)
    return out[:, :s]


def supported(q, k, v, heads, causal, kv_mask, q_offset):
    """Shapes/modes the kernel handles."""
    if kv_mask is not None or q_offset is not None:
        return False
    if q.shape != k.shape or k.shape != v.shape:
        return False
    n, s, d = q.shape
    if d % heads:
        return False
    dh = d // heads
    if s % 8 != 0 and not causal:
        return False  # tail padding is only masked-safe under causality
    if dh % 64 != 0:
        return False
    if s > 2048:
        return False  # whole-row kernel holds (S, S) scores in VMEM
    return True
