"""Fused shared-prefix decode attention (Pallas TPU kernel).

The rollout-beam decode hot loop (``ops/attention.py::shared_prefix_attention``)
is HBM-bound: every generated token streams the whole shared prefix K/V
(N, H, S, dh) plus the per-rollout blocks.  This kernel fuses the full
attention for one batch element — prefix scores, block scores, joint masked
softmax, and both weighted sums — into one pass over the K/V tiles.

Head handling: instead of a per-head loop of tiny matmuls (latency-bound),
heads are flattened into the contraction ROW dimension.  With K viewed as
(H*S, dh) and the rollout queries as (dh, H*B), one MXU dot produces every
(key-head, query-head) score pair; cross-head pairs are masked out in the
softmax, which zeroes them in the probability matrix, so the value pass
``P^T (H*S) x V (H*S, dh)`` automatically reads each head's value stripe.
Four MXU dots per (batch element, layer), no scalar loops.

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


def _kernel(idx_ref, q_ref, ks_ref, vs_ref, kb_ref, vb_ref, out_ref, *,
            scale):
    """One batch element.  Refs: q (1,H,B,dh), prefix K/V (1,H,S,dh),
    blocks (1,H,B,bw,dh) -> out (1,H,B,dh)."""
    index0 = idx_ref[0]
    block_index = idx_ref[1]
    _, h, b, dh = q_ref.shape
    s = ks_ref.shape[2]
    bw = kb_ref.shape[3]
    hb = h * b

    # Q2: (H*B, dh) rows of rollout queries — bf16 into the MXU
    q2 = q_ref[0].reshape(hb, dh)

    # ---- prefix scores: (H*B, H*S) with keys on the LANE axis (full
    # 128-lane utilization); valid iff key head == query head and
    # slot < index0 ----
    k2 = ks_ref[0].reshape(h * s, dh)
    sc_s = jax.lax.dot_general(
        q2, k2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale            # (HB, H*S)
    row_h = jax.lax.broadcasted_iota(jnp.int32, (hb, h * s), 0) // b
    col_h = jax.lax.broadcasted_iota(jnp.int32, (hb, h * s), 1) // s
    col_slot = jax.lax.broadcasted_iota(jnp.int32, (hb, h * s), 1) % s
    valid_s = jnp.logical_and(row_h == col_h, col_slot < index0)
    sc_s = jnp.where(valid_s, sc_s, NEG)

    # ---- block scores: (H*B, H*B*bw), valid iff (head, rollout) match and
    # slot <= block_index ----
    kb2 = kb_ref[0].reshape(h * b * bw, dh)
    sc_b = jax.lax.dot_general(
        q2, kb2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale            # (HB, HB*bw)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (hb, h * b * bw), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (hb, h * b * bw), 1)
    valid_b = jnp.logical_and(r_iota == (c_iota // bw),
                              (c_iota % bw) <= block_index)
    sc_b = jnp.where(valid_b, sc_b, NEG)

    # ---- joint masked softmax per row ----
    m = jnp.maximum(jnp.max(sc_s, axis=1), jnp.max(sc_b, axis=1))  # (H*B,)
    # exp(NEG - m) underflows to exactly 0, so no second masking pass
    p_s = jnp.exp(sc_s - m[:, None])
    p_b = jnp.exp(sc_b - m[:, None])
    denom = jnp.sum(p_s, axis=1) + jnp.sum(p_b, axis=1)            # (H*B,)

    # ---- value passes: (H*B, dh); zeros outside each row's head stripe
    # make the contraction read exactly that head's values ----
    v2 = vs_ref[0].reshape(h * s, dh)
    o_s = jax.lax.dot_general(
        p_s.astype(jnp.bfloat16), v2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    vb2 = vb_ref[0].reshape(h * b * bw, dh)
    o_b = jax.lax.dot_general(
        p_b.astype(jnp.bfloat16), vb2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = (o_s + o_b) / denom[:, None]
    out_ref[0] = out.reshape(h, b, dh).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads",))
def shared_prefix_attention_fused(q, k_shared, v_shared, k_block, v_block,
                                  index0, block_index, heads=None):
    """Drop-in replacement for ``attention.shared_prefix_attention``.

    Args:
      q: (N*B, 1, D).
      k_shared, v_shared: (N, H, S, dh).
      k_block, v_block: (N*B, H, bw, dh).
      index0, block_index: traced scalars.

    Returns (N*B, 1, D).
    """
    nb, _, d = q.shape
    n, h, s, dh = k_shared.shape
    b = nb // n
    bw = k_block.shape[2]
    scale = 1.0 / math.sqrt(dh)

    q4 = q.reshape(n, b, h, dh).transpose(0, 2, 1, 3)           # (N,H,B,dh)
    kb = k_block.reshape(n, b, h, bw, dh).transpose(0, 2, 1, 3, 4)
    vb = v_block.reshape(n, b, h, bw, dh).transpose(0, 2, 1, 3, 4)
    idx = jnp.stack([jnp.asarray(index0, jnp.int32),
                     jnp.asarray(block_index, jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, b, dh), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, s, dh), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, s, dh), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, b, bw, dh), lambda i, idx: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, h, b, bw, dh), lambda i, idx: (i, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, b, dh), lambda i, idx: (i, 0, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((n, h, b, dh), q.dtype),
        grid_spec=grid_spec,
    )(idx, q4, k_shared, v_shared, kb, vb)
    return out.transpose(0, 2, 1, 3).reshape(nb, 1, d)
