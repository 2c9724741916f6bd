"""Fused shared-prefix decode attention (Pallas TPU kernels).

The rollout-beam decode hot loop
(``ops/attention.py::shared_prefix_attention``) is HBM-bound: every
generated token streams the whole shared prefix K/V plus the per-rollout
blocks.  These kernels fuse the full attention for one batch element —
prefix scores, block scores, joint masked softmax, and both weighted
sums — into one pass over the K/V tiles, on the TRANSPOSED (N, H, dh, S)
cache layout (dense 128-lane tiles; see
``ops.attention.transpose_heads_t``).

Two variants: bf16, and int8 with IN-KERNEL dequantization — the int8
tiles stream from HBM at half the bytes and the per-slot scales fold into
the f32 score matrix / softmax probabilities, so the dequantized operand
XLA's int8 path would materialize never exists.

Round-2's flattened-heads kernel on the padded (N, H, S, dh) layout is
retired (results preserved in docs/PERFORMANCE.md).

Numerics: scores/softmax in float32 like the einsum path; reduction order
differs from XLA's, so outputs match to float tolerance, not bit-exactly.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


# ---------------------------------------------------------------------------
# Transposed-layout (lanes = S) kernels — round-3 generation.
#
# The round-2 kernels above stream (.., S, dh=64) tiles whose 64-wide minor
# dim is padded to 128 lanes in VMEM/HBM: every DMA moves ~2x the logical
# bytes, which is where the "Pallas is 40% slower than XLA" plateau came
# from.  Storing the prefix K/V transposed as (N, H, dh, S) puts S (>= 128)
# on the lane axis — tiles are dense, and the score dot takes K^T in its
# MXU-native (contracting, free) layout.  The int8 variant additionally
# dequantizes INSIDE the kernel: int8 tiles stream from HBM (half the
# bytes), the per-slot scales fold into the f32 score matrix and the
# softmax probabilities, and the MXU sees bf16 — the dequantized operand
# XLA would materialize in HBM (qaig_tpu/ops/kv_quant.py) never exists.
# ---------------------------------------------------------------------------


def _head_attention(q_h, kt_h, vt_h, kb_h, vb_h, index0, block_index,
                    scale, k_scale_h=None, v_scale_h=None):
    """One head's shared-prefix + block attention on transposed tiles.

    q_h (B, dh) bf16; kt_h/vt_h (dh, S) bf16 or int8 (+ per-slot scales
    (S,) f32); kb_h/vb_h (B, bw, dh) bf16.  Returns (B, dh) f32.
    """
    b, dh = q_h.shape
    s = kt_h.shape[1]
    bw = kb_h.shape[1]

    k_op = kt_h.astype(jnp.bfloat16) if kt_h.dtype == jnp.int8 else kt_h
    sc_s = jax.lax.dot_general(
        q_h, k_op, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (B, S)
    if k_scale_h is not None:
        sc_s = sc_s * k_scale_h[None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    sc_s = jnp.where(col < index0, sc_s, NEG)

    # per-rollout block scores as one (B, B*bw) dot with cross-rollout
    # pairs masked (Mosaic-friendly 2D ops; the waste is 4x32 floats)
    kb2 = kb_h.reshape(b * bw, dh)
    sc_b = jax.lax.dot_general(
        q_h, kb2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (B, B*bw)
    brow = jax.lax.broadcasted_iota(jnp.int32, (b, b * bw), 0)
    bcol = jax.lax.broadcasted_iota(jnp.int32, (b, b * bw), 1)
    valid_b = jnp.logical_and(brow == bcol // bw,
                              (bcol % bw) <= block_index)
    sc_b = jnp.where(valid_b, sc_b, NEG)

    m = jnp.maximum(jnp.max(sc_s, axis=1), jnp.max(sc_b, axis=1))  # (B,)
    p_s = jnp.exp(sc_s - m[:, None])
    p_b = jnp.exp(sc_b - m[:, None])
    denom = jnp.sum(p_s, axis=1) + jnp.sum(p_b, axis=1)

    pv = p_s * v_scale_h[None, :] if v_scale_h is not None else p_s
    v_op = vt_h.astype(jnp.bfloat16) if vt_h.dtype == jnp.int8 else vt_h
    o_s = jax.lax.dot_general(
        pv.astype(jnp.bfloat16), v_op, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (B, dh)
    vb2 = vb_h.reshape(b * bw, dh)
    o_b = jax.lax.dot_general(
        p_b.astype(jnp.bfloat16), vb2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (B, dh)
    return (o_s + o_b) / denom[:, None]


def _kernel_t_bf16(idx_ref, q_ref, kt_ref, vt_ref, kb_ref, vb_ref, out_ref,
                   *, scale):
    index0, block_index = idx_ref[0], idx_ref[1]
    h = q_ref.shape[1]
    for i in range(h):
        out = _head_attention(q_ref[0, i], kt_ref[0, i], vt_ref[0, i],
                              kb_ref[0, i], vb_ref[0, i], index0,
                              block_index, scale)
        out_ref[0, i] = out.astype(out_ref.dtype)


def _kernel_t_int8(idx_ref, q_ref, kt_ref, ks_ref, vt_ref, vs_ref, kb_ref,
                   vb_ref, out_ref, *, scale):
    index0, block_index = idx_ref[0], idx_ref[1]
    h = q_ref.shape[1]
    for i in range(h):
        out = _head_attention(q_ref[0, i], kt_ref[0, i], vt_ref[0, i],
                              kb_ref[0, i], vb_ref[0, i], index0,
                              block_index, scale,
                              k_scale_h=ks_ref[0, i].astype(jnp.float32),
                              v_scale_h=vs_ref[0, i].astype(jnp.float32))
        out_ref[0, i] = out.astype(out_ref.dtype)


def _prep_qb(q, k_block, v_block, n):
    nb, _, d = q.shape
    b = nb // n
    bw = k_block.shape[2]
    h = k_block.shape[1]
    dh = d // h
    q4 = q.reshape(n, b, h, dh).transpose(0, 2, 1, 3)        # (N,H,B,dh)
    kb = k_block.reshape(n, b, h, bw, dh).transpose(0, 2, 1, 3, 4)
    vb = v_block.reshape(n, b, h, bw, dh).transpose(0, 2, 1, 3, 4)
    return q4, kb, vb, b, bw, h, dh


@jax.jit
def shared_prefix_attention_fused_t(q, kt_shared, vt_shared, k_block,
                                    v_block, index0, block_index):
    """Fused shared-prefix rollout attention over TRANSPOSED (N, H, dh, S)
    prefix caches (dense lane tiles).  Drop-in output-compatible with
    ``attention.shared_prefix_attention``; q/k_block/v_block keep their
    engine shapes ((N*B, 1, D) / (N*B, H, bw, dh))."""
    n, h, dh, s = kt_shared.shape
    q4, kb, vb, b, bw, _, _ = _prep_qb(q, k_block, v_block, n)
    scale = 1.0 / math.sqrt(dh)
    idx = jnp.stack([jnp.asarray(index0, jnp.int32),
                     jnp.asarray(block_index, jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, b, dh), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, dh, s), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, dh, s), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, b, bw, dh), lambda i, idx: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, h, b, bw, dh), lambda i, idx: (i, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, b, dh), lambda i, idx: (i, 0, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_t_bf16, scale=scale),
        out_shape=jax.ShapeDtypeStruct((n, h, b, dh), q.dtype),
        grid_spec=grid_spec,
    )(idx, q4, kt_shared, vt_shared, kb, vb)
    return out.transpose(0, 2, 1, 3).reshape(q.shape[0], 1, q.shape[2])


@jax.jit
def shared_prefix_attention_fused_int8(q, k8t_shared, k_scale, v8t_shared,
                                       v_scale, k_block, v_block, index0,
                                       block_index):
    """int8 shared-prefix rollout attention with IN-KERNEL dequantization.

    The prefix K/V stream from HBM as dense int8 (N, H, dh, S) tiles — half
    the bytes of bf16 — with per-slot symmetric scales (N, H, S) bf16.  The
    scales fold into the f32 score matrix (K side) and the softmax
    probabilities (V side), so no dequantized copy of the cache ever
    materializes (the XLA int8 path's bottleneck, ``ops/kv_quant.py``).
    """
    n, h, dh, s = k8t_shared.shape
    q4, kb, vb, b, bw, _, _ = _prep_qb(q, k_block, v_block, n)
    scale = 1.0 / math.sqrt(dh)
    idx = jnp.stack([jnp.asarray(index0, jnp.int32),
                     jnp.asarray(block_index, jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, b, dh), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, dh, s), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, s), lambda i, idx: (i, 0, 0)),
            pl.BlockSpec((1, h, dh, s), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, s), lambda i, idx: (i, 0, 0)),
            pl.BlockSpec((1, h, b, bw, dh), lambda i, idx: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, h, b, bw, dh), lambda i, idx: (i, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, b, dh), lambda i, idx: (i, 0, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_t_int8, scale=scale),
        out_shape=jax.ShapeDtypeStruct((n, h, b, dh), q.dtype),
        grid_spec=grid_spec,
    )(idx, q4, k8t_shared, k_scale, v8t_shared, v_scale, kb, vb)
    return out.transpose(0, 2, 1, 3).reshape(q.shape[0], 1, q.shape[2])
