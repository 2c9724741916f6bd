"""Multi-head attention core (XLA einsum path).

Math parity with the reference attention (``models/layers.py:370-474``):

* Q/K/V come from 2-layer MLPs (handled by the caller) — this module only
  performs the scaled-dot-product over already-projected (N, S, D) tensors,
* heads are a reshape-split of D, scale is ``1/sqrt(D/heads)``,
* causal masking sets future positions to -inf before the softmax (the
  reference builds this via a 2e9 sentinel then replaces with -inf — the
  fixed point is identical),
* there is **no output projection** after merging heads.

A Pallas flash-attention kernel (``qaig_tpu.ops.flash_attention``) is used on
TPU for long sequences; this einsum path is the reference semantics and the
fallback for small shapes / CPU tests.
"""

import math

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")

_FLASH_ENABLED = False


def use_flash_default():
    """Whether to dispatch to the Pallas fused-attention kernel.

    Default OFF: measured on TPU v5e at reference shapes (S 256, dh 64,
    batch 64-128) the XLA einsum path is faster both for training
    (124 vs 166 ms/step) and for the cascade decode bench (116 vs 114
    img/s) — the per-(batch, head) whole-row kernel underutilizes the MXU at
    dh=64 and its recompute backward costs more than XLA's saved-scores
    path.  Opt in via ``set_flash_enabled(True)`` for larger shapes.
    """
    return _FLASH_ENABLED


def set_flash_enabled(value):
    global _FLASH_ENABLED
    _FLASH_ENABLED = value


_FUSED_DECODE_ENABLED = False


def set_fused_decode_enabled(value):
    """Dispatch the rollout decode's shared-prefix attention to the Pallas
    transposed-layout kernels (``ops/decode_attention.py``) instead of the
    XLA einsum path.  Off by default pending the on-chip A/B
    (docs/PERFORMANCE.md)."""
    global _FUSED_DECODE_ENABLED
    _FUSED_DECODE_ENABLED = value


def _fused_decode_supported(q, k_shared, k_block):
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if q.ndim != 3 or q.shape[1] != 1 or k_shared.ndim != 4:
        return False
    # The per-head kernels fold the block cache (B, bw, dh) -> (B*bw, dh),
    # a Mosaic shape cast that only compiles when bw is sublane-aligned —
    # crossing segments with bw = n_cached (e.g. 7) must fall back (same
    # constraint as decode_attention.flat_segment_supported).
    bw = k_block.shape[2]
    if bw == 0 or bw % 8 != 0:
        return False
    n = k_shared.shape[0]
    return q.shape[0] % n == 0


def split_heads(x, heads):
    """(N, S, D) -> (N, H, S, D/H)."""
    n, s, d = x.shape
    return x.reshape(n, s, heads, d // heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    """(N, H, S, Dh) -> (N, S, H*Dh)."""
    n, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(n, s, h * dh)


def dot_product_attention(q, k, v, heads, causal=False, kv_mask=None,
                          q_offset=None):
    """Scaled dot-product attention over projected tensors.

    Args:
      q, k, v: (N, Sq, D) / (N, Sk, D) / (N, Sk, D).
      heads: number of heads (D must divide).
      causal: apply a causal mask.  When ``q_offset`` is given, query ``i``
        is treated as absolute position ``q_offset + i`` (decode-step mode).
      kv_mask: optional (N, Sk) boolean; False keys are masked out (ring
        buffers / padded prefixes).
      q_offset: optional scalar (traced ok) absolute position of q[0].

    Returns (N, Sq, D).
    """
    if use_flash_default():
        from qaig_tpu.ops import flash_attention as fa
        if fa.supported(q, k, v, heads, causal, kv_mask, q_offset):
            return fa.flash_attention(q, k, v, heads, causal=causal)

    n, sq, d = q.shape
    sk = k.shape[1]
    dh = d // heads
    scale = 1.0 / math.sqrt(dh)

    qh = split_heads(q, heads)
    kh = split_heads(k, heads)
    vh = split_heads(v, heads)

    scores = jnp.einsum("nhqd,nhkd->nhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale

    mask = None
    if causal:
        q_pos = jnp.arange(sq)
        if q_offset is not None:
            q_pos = q_pos + q_offset
        k_pos = jnp.arange(sk)
        mask = k_pos[None, :] <= q_pos[:, None]  # (Sq, Sk) True = keep
        mask = mask[None, None]
    if kv_mask is not None:
        km = kv_mask[:, None, None, :]  # (N, 1, 1, Sk)
        mask = km if mask is None else jnp.logical_and(mask, km)

    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)

    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("nhqk,nhkd->nhqd", weights, vh,
                     preferred_element_type=jnp.float32)
    return merge_heads(out).astype(q.dtype)


def transpose_heads_t(x_split):
    """Head-split (N, H, S, dh) -> cache-layout (N, H, dh, S).

    Decode caches are STORED with S on the minor (lane) axis: a dh=64 minor
    dim is padded to 128 lanes in TPU HBM, so the (N, H, S, dh) layout
    streams ~2x the logical bytes — measured 5.8 vs 1.1 ms per 7-layer
    decode step at bench shapes (scripts/probe_layout.py).  The transposed
    layout is also the MXU-native (contracting, free) shape for the score
    dot."""
    return x_split.transpose(0, 1, 3, 2)


def shared_prefix_attention(q, k_shared, v_shared, k_block, v_block,
                            index0, block_index, k_scale=None, v_scale=None):
    """Beam-rollout decode attention over a SHARED prefix cache plus a
    per-rollout block.

    Rollouts of the same batch element share every token generated before
    the current segment, so the big prefix cache stays at N rows and only
    the segment's new K/V are per-rollout — this removes the dominant
    tile/select traffic of beam search.

    Args:
      q: (N*B, 1, D) new-token queries (B rollouts per element, grouped
        [n0b0, n0b1, ..., n1b0, ...]).
      k_shared, v_shared: (N, H, dh, S) TRANSPOSED shared prefix (valid
        slots < ``index0``); S on the lane axis streams unpadded (see
        :func:`transpose_heads_t`).
      k_block, v_block: (N*B, H, bw, dh) per-rollout segment K/V (valid
        slots <= ``block_index``).
      index0: scalar — shared prefix length.
      block_index: scalar — current position within the segment.
      k_scale, v_scale: optional (N, H, S) per-slot scales when the shared
        prefix is stored int8 (``ops/kv_quant.py``): scales fold into the
        f32 scores / probabilities, so no dequantized cache materializes.

    Returns (N*B, 1, D).
    """
    if k_shared.ndim == 3:
        # INTERLEAVED (N, dh, S*H) caches (column = slot*H + head): the
        # flat Pallas kernel is the only consumer of this layout — it
        # reads jit-arg caches directly at full stream rate, where the
        # XLA einsum needs a materialized well-laid-out copy first
        # (docs/PERFORMANCE.md round-3 kernels).
        from qaig_tpu.ops import decode_attention as da
        heads = q.shape[2] // k_shared.shape[1]
        return da.shared_prefix_attention_fused_flat(
            q, k_shared, v_shared, k_block, v_block, index0, block_index,
            heads=heads, k_scale=k_scale, v_scale=v_scale)

    if _FUSED_DECODE_ENABLED and _fused_decode_supported(q, k_shared,
                                                         k_block):
        from qaig_tpu.ops import decode_attention as da
        if k_scale is not None:
            return da.shared_prefix_attention_fused_int8(
                q, k_shared, k_scale, v_shared, v_scale, k_block, v_block,
                index0, block_index)
        return da.shared_prefix_attention_fused_t(
            q, k_shared, v_shared, k_block, v_block, index0, block_index)

    nb, _, d = q.shape
    n, heads, dh, s = k_shared.shape
    b = nb // n
    bw = k_block.shape[2]
    scale = 1.0 / math.sqrt(dh)

    qh = split_heads(q, heads)                      # (N*B, H, 1, dh)
    qg = qh.reshape(n, b, heads, 1, dh)

    k_op = k_shared.astype(q.dtype) if k_shared.dtype == jnp.int8 \
        else k_shared
    s_shared = jnp.einsum("nbhqd,nhdk->nbhqk", qg, k_op,
                          preferred_element_type=jnp.float32) * scale
    if k_scale is not None:
        s_shared = s_shared * k_scale[:, None, :, None, :].astype(
            jnp.float32)
    s_shared = s_shared.reshape(nb, heads, 1, s)
    valid_shared = (jnp.arange(s) < index0)[None, None, None, :]
    s_shared = jnp.where(valid_shared, s_shared, NEG_INF)

    s_block = jnp.einsum("nhqd,nhkd->nhqk", qh, k_block,
                         preferred_element_type=jnp.float32) * scale
    valid_block = (jnp.arange(bw) <= block_index)[None, None, None, :]
    s_block = jnp.where(valid_block, s_block, NEG_INF)

    scores = jnp.concatenate([s_shared, s_block], axis=-1)
    weights = jax.nn.softmax(scores, axis=-1)
    w_shared = weights[..., :s].reshape(n, b, heads, 1, s)
    if v_scale is not None:
        w_shared = w_shared * v_scale[:, None, :, None, :].astype(
            w_shared.dtype)
    w_block = weights[..., s:]

    v_op = v_shared.astype(q.dtype) if v_shared.dtype == jnp.int8 \
        else v_shared
    out = jnp.einsum("nbhqk,nhdk->nbhqd", w_shared, v_op,
                     preferred_element_type=jnp.float32).reshape(
                         nb, heads, 1, dh)
    out = out + jnp.einsum("nhqk,nhkd->nhqd", w_block, v_block,
                           preferred_element_type=jnp.float32)
    return merge_heads(out).astype(q.dtype)


def shared_cross_attention(q, k_shared, v_shared):
    """Cross-attention where K/V ((N, H, dh, S) transposed, all slots
    valid) are shared across B rollouts; q is (N*B, T, D) (T >= 1 query
    slots)."""
    nb, t, d = q.shape
    n, heads, dh, s = k_shared.shape
    b = nb // n
    scale = 1.0 / math.sqrt(dh)

    qg = split_heads(q, heads).reshape(n, b, heads, t, dh)
    scores = jnp.einsum("nbhqd,nhdk->nbhqk", qg, k_shared,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("nbhqk,nhdk->nbhqd", weights, v_shared,
                     preferred_element_type=jnp.float32)
    return merge_heads(out.reshape(nb, heads, t, dh)).astype(q.dtype)


def shared_prefix_block_attention(q, k_shared, v_shared, k_block, v_block):
    """Windowed-decode attention for a per-rollout tail over a window whose
    leading slots are SHARED across B rollouts.

    Used by the shared windowed rollout segment
    (:meth:`qaig_tpu.models.transformer.Transformer.window_forward_shared`):
    when the sliding window starts moving during beam-rollout decode, the
    window's leading slots (everything generated before the current segment)
    are identical across the ``B`` rollouts of a batch element, so their K/V
    stay at N rows and only the segment's tail is per-rollout.

    Args:
      q: (N*B, Tq, D) queries for the LAST ``Tq`` tail slots (tail-aligned:
        query ``i`` sits at tail position ``T - Tq + i``).
      k_shared, v_shared: (N, H, S0, dh) shared window slots — all valid and
        all causally visible to every tail slot.
      k_block, v_block: (N*B, H, T, dh) per-rollout tail K/V.

    Returns (N*B, Tq, D).
    """
    nb, tq, d = q.shape
    n, heads, s0, dh = k_shared.shape
    b = nb // n
    t = k_block.shape[2]
    scale = 1.0 / math.sqrt(dh)

    qh = split_heads(q, heads)                      # (N*B, H, Tq, dh)
    qg = qh.reshape(n, b, heads, tq, dh)

    s_shared = jnp.einsum("nbhqd,nhkd->nbhqk", qg, k_shared,
                          preferred_element_type=jnp.float32) * scale
    s_shared = s_shared.reshape(nb, heads, tq, s0)

    s_block = jnp.einsum("nhqd,nhkd->nhqk", qh, k_block,
                         preferred_element_type=jnp.float32) * scale
    q_pos = jnp.arange(tq) + (t - tq)               # tail-aligned positions
    causal = q_pos[:, None] >= jnp.arange(t)[None, :]
    s_block = jnp.where(causal[None, None], s_block, NEG_INF)

    scores = jnp.concatenate([s_shared, s_block], axis=-1)
    weights = jax.nn.softmax(scores, axis=-1)
    w_shared = weights[..., :s0].reshape(n, b, heads, tq, s0)
    out = jnp.einsum("nbhqk,nhkd->nbhqd", w_shared, v_shared,
                     preferred_element_type=jnp.float32).reshape(
                         nb, heads, tq, dh)
    out = out + jnp.einsum("nhqk,nhkd->nhqd", weights[..., s0:], v_block,
                           preferred_element_type=jnp.float32)
    return merge_heads(out).astype(q.dtype)


def decode_attention_presplit(q, k_cache, v_cache, kv_mask):
    """Single-token attention against transposed head-split caches.

    Args:
      q: (N, 1, D) projected query for the new token.
      k_cache, v_cache: (N, H, dh, S) — head-split (no per-step transpose
        of the cache) AND slot-minor (dense 128-lane tiles; a dh-minor
        layout streams ~2x the bytes, see :func:`transpose_heads_t`).
      kv_mask: (N, S) bool, True = valid cache slot.

    Returns (N, 1, D).
    """
    n, _, d = q.shape
    heads, dh, s = k_cache.shape[1:]
    scale = 1.0 / math.sqrt(dh)

    qh = split_heads(q, heads)  # (N, H, 1, dh) — tiny
    scores = jnp.einsum("nhqd,nhdk->nhqk", qh, k_cache,
                        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(kv_mask[:, None, None, :], scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("nhqk,nhdk->nhqd", weights, v_cache,
                     preferred_element_type=jnp.float32)
    return merge_heads(out).astype(q.dtype)
