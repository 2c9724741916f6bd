"""Transformer building blocks: AdaLN-Zero, residual, FFN, attention blocks.

Capability parity with reference ``models/layers.py:100-667``, rebuilt as
pure functions over explicit param trees.  Architectural quirks preserved
(they define the checkpoint-compatible function):

* Q/K/V are 2-layer MLPs (in -> hidden, activated -> in), no output
  projection after the head merge,
* the residual layer applies its activation **after** the skip add
  (``layers.py:301-303``),
* the DiT gate (``ScaleLayer`` on the conditioning vector) multiplies the
  branch *input* before its linear projection,
* FFN applies the activation on **both** MLP layers (``layers.py:330-340``).

Every block has a ``*_step`` decode variant operating on a single new token
against KV caches — the TPU-native replacement for the reference's
recompute-the-window decode loop.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from qaig_tpu.models import core
from qaig_tpu.ops.activations import get_activation
from qaig_tpu.ops.attention import (dot_product_attention,
                                    decode_attention_presplit, split_heads)


@dataclass(frozen=True)
class BlockConfig:
    """Static configuration of one transformer block (reference
    ``TransformerBlock`` flags, ``models/layers.py:603-667``)."""
    in_dim: int = 512
    cond_dim: int = 512
    cross_cond_dim: int = 512
    hidden_dim: int = 512
    self_attn_heads: int = 8
    cross_attn_heads: int = 8
    use_cross_attn: bool = True
    use_masked_attn: bool = True
    use_adaln0: bool = False
    use_scale_layer: bool = False
    activation_type: str = "silu"

    @property
    def act(self):
        return get_activation(self.activation_type)


# ---------------------------------------------------------------------------
# AdaLN-Zero (reference models/layers.py:130-153)
# ---------------------------------------------------------------------------

def init_adaln_zero(rng, cond_dim, dim):
    r_scale, r_shift = jax.random.split(rng)
    return {
        "scale": core.init_linear(r_scale, cond_dim, dim, zero_weight=True),
        "shift": core.init_linear(r_shift, cond_dim, dim, zero_weight=True),
    }


def adaln_zero(params, x, cond):
    x_norm = core.layer_norm(x)
    scale = core.linear(params["scale"], cond)
    shift = core.linear(params["shift"], cond)
    return scale * x_norm + shift


def init_block_norm(rng, cfg: BlockConfig):
    if cfg.use_adaln0:
        return init_adaln_zero(rng, cfg.cond_dim, cfg.in_dim)
    return core.init_layer_norm(cfg.in_dim)


def block_norm(params, cfg: BlockConfig, x, cond):
    if cfg.use_adaln0:
        return adaln_zero(params, x, cond)
    return core.affine_layer_norm(params, x)


# ---------------------------------------------------------------------------
# Residual linear (reference models/layers.py:258-304)
# ---------------------------------------------------------------------------

def init_residual(rng, in_dim, out_dim, skip_dim, cond_dim, use_scale_layer):
    r_lin, r_scale, r_skip = jax.random.split(rng, 3)
    params = {"linear": core.init_linear(r_lin, in_dim, out_dim)}
    if use_scale_layer:
        params["scale"] = core.init_linear(
            r_scale, cond_dim, in_dim, zero_weight=True)
    if skip_dim != out_dim:
        params["skip"] = core.init_linear(r_skip, skip_dim, out_dim)
    return params


def residual(params, x, x_skip, cond, act):
    if "scale" in params:
        x = x * core.linear(params["scale"], cond)
    x = core.linear(params["linear"], x)
    if "skip" in params:
        x_skip = core.linear(params["skip"], x_skip)
    return act(x + x_skip)


# ---------------------------------------------------------------------------
# MLP-projected attention (reference models/layers.py:370-474)
# ---------------------------------------------------------------------------

def init_qkv(rng, in_dim, hidden_dim, kv_in_dim):
    rq, rk, rv = jax.random.split(rng, 3)
    return {
        "q": core.init_mlp2(rq, in_dim, hidden_dim, in_dim),
        "k": core.init_mlp2(rk, kv_in_dim, hidden_dim, in_dim),
        "v": core.init_mlp2(rv, kv_in_dim, hidden_dim, in_dim),
    }


def project_q(params, x, act):
    return core.mlp2(params["q"], x, act)


def project_kv(params, x, act):
    return core.mlp2(params["k"], x, act), core.mlp2(params["v"], x, act)


def pack_qkv(attn_params):
    """Fuse the three 2-layer Q/K/V MLPs for the decode hot path: one
    (D, 3H) matmul for the first layers (identical input) and one batched
    (3, H, D) matmul for the second.  Exactly the same math, 6 matmuls -> 2
    per layer per decode step (decode is launch/bandwidth bound)."""
    l0w = jnp.concatenate(
        [attn_params[k]["l0"]["w"] for k in ("q", "k", "v")], axis=1)
    l0b = jnp.concatenate(
        [attn_params[k]["l0"]["b"] for k in ("q", "k", "v")], axis=0)
    l1w = jnp.stack([attn_params[k]["l1"]["w"] for k in ("q", "k", "v")])
    l1b = jnp.stack([attn_params[k]["l1"]["b"] for k in ("q", "k", "v")])
    return {"l0w": l0w, "l0b": l0b, "l1w": l1w, "l1b": l1b}


def packed_qkv(packed, x, act):
    """(N, P, D) -> (q, k, v) each (N, P, D) via the packed projections."""
    n, p, _ = x.shape
    hidden = packed["l1w"].shape[1]
    h = act(x @ packed["l0w"] + packed["l0b"])          # (N, P, 3H)
    h = h.reshape(n, p, 3, hidden).transpose(2, 0, 1, 3)  # (3, N, P, H)
    out = jnp.einsum("snph,shd->snpd", h, packed["l1w"],
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out + packed["l1b"][:, None, None].astype(x.dtype)
    return out[0], out[1], out[2]


# ---------------------------------------------------------------------------
# Self-attention block (reference models/layers.py:478-534)
# ---------------------------------------------------------------------------

def init_self_attn_block(rng, cfg: BlockConfig):
    r_norm, r_attn, r_res = jax.random.split(rng, 3)
    return {
        "norm": init_block_norm(r_norm, cfg),
        "attn": init_qkv(r_attn, cfg.in_dim, cfg.hidden_dim, cfg.in_dim),
        "res": init_residual(r_res, cfg.in_dim, cfg.in_dim, cfg.in_dim,
                             cfg.cond_dim, cfg.use_scale_layer),
    }


def self_attn_block(params, cfg: BlockConfig, x, cond=None):
    x0 = x
    x = block_norm(params["norm"], cfg, x, cond)
    q = project_q(params["attn"], x, cfg.act)
    k, v = project_kv(params["attn"], x, cfg.act)
    x = dot_product_attention(q, k, v, cfg.self_attn_heads,
                              causal=cfg.use_masked_attn)
    return residual(params["res"], x, x0, cond, cfg.act)


def self_attn_block_step(params, cfg: BlockConfig, x, cond, cache, index,
                         packed=None):
    """Single-token decode through the self-attention block.

    Args:
      x: (N, 1, D) new-token residual stream.
      cache: {"k": (N, S_max, D), "v": (N, S_max, D)} KV ring for this block.
      index: scalar — number of tokens already cached (write position).
      packed: optional :func:`pack_qkv` output for the fused projections.

    Returns (out (N, 1, D), updated cache).
    """
    x0 = x
    x = block_norm(params["norm"], cfg, x, cond)
    if packed is not None:
        q, k_new, v_new = packed_qkv(packed, x, cfg.act)
    else:
        q = project_q(params["attn"], x, cfg.act)
        k_new, v_new = project_kv(params["attn"], x, cfg.act)
    # caches are stored head-split AND transposed (N, H, dh, S): the
    # per-step write is a (N, H, dh, 1) column and attention streams dense
    # lane tiles (see ops.attention.transpose_heads_t).
    from qaig_tpu.ops.attention import transpose_heads_t
    heads = cfg.self_attn_heads
    k_cache = jax.lax.dynamic_update_slice_in_dim(
        cache["k"], transpose_heads_t(split_heads(k_new, heads)), index, 3)
    v_cache = jax.lax.dynamic_update_slice_in_dim(
        cache["v"], transpose_heads_t(split_heads(v_new, heads)), index, 3)
    s_max = k_cache.shape[3]
    kv_mask = (jnp.arange(s_max) <= index)[None, :]
    kv_mask = jnp.broadcast_to(kv_mask, (x.shape[0], s_max))
    out = decode_attention_presplit(q, k_cache, v_cache, kv_mask)
    out = residual(params["res"], out, x0, cond, cfg.act)
    return out, {"k": k_cache, "v": v_cache}


# ---------------------------------------------------------------------------
# Cross-attention block (reference models/layers.py:538-599; never masked)
# ---------------------------------------------------------------------------

def init_cross_attn_block(rng, cfg: BlockConfig):
    r_norm, r_attn, r_res = jax.random.split(rng, 3)
    return {
        "norm": init_block_norm(r_norm, cfg),
        "attn": init_qkv(r_attn, cfg.in_dim, cfg.hidden_dim,
                         cfg.cross_cond_dim),
        "res": init_residual(r_res, cfg.in_dim, cfg.in_dim, cfg.in_dim,
                             cfg.cond_dim, cfg.use_scale_layer),
    }


def cross_attn_block(params, cfg: BlockConfig, x, cross_cond, cond=None,
                     precomputed_kv=None):
    x0 = x
    x = block_norm(params["norm"], cfg, x, cond)
    q = project_q(params["attn"], x, cfg.act)
    if precomputed_kv is not None:
        k, v = precomputed_kv["k"], precomputed_kv["v"]
    else:
        k, v = project_kv(params["attn"], cross_cond, cfg.act)
    x = dot_product_attention(q, k, v, cfg.cross_attn_heads, causal=False)
    return residual(params["res"], x, x0, cond, cfg.act)


def cross_attn_kv(params, cross_cond, act):
    """Precompute the encoder-side K/V once per sequence (decode path)."""
    k, v = project_kv(params["attn"], cross_cond, act)
    return {"k": k, "v": v}


# ---------------------------------------------------------------------------
# Feedforward block (reference models/layers.py:308-366)
# ---------------------------------------------------------------------------

def init_ffn_block(rng, cfg: BlockConfig):
    r_norm, r_ff, r_res = jax.random.split(rng, 3)
    return {
        "norm": init_block_norm(r_norm, cfg),
        "ff": core.init_mlp2(r_ff, cfg.in_dim, cfg.hidden_dim, cfg.in_dim),
        "res": init_residual(r_res, cfg.in_dim, cfg.in_dim, cfg.in_dim,
                             cfg.cond_dim, cfg.use_scale_layer),
    }


def ffn_block(params, cfg: BlockConfig, x, cond=None):
    x0 = x
    x = block_norm(params["norm"], cfg, x, cond)
    x = core.mlp2(params["ff"], x, cfg.act, act_last=True)
    return residual(params["res"], x, x0, cond, cfg.act)


# ---------------------------------------------------------------------------
# Full transformer block (reference models/layers.py:603-667)
# ---------------------------------------------------------------------------

def init_transformer_block(rng, cfg: BlockConfig):
    r_self, r_cross, r_ffn = jax.random.split(rng, 3)
    params = {
        "self_attn": init_self_attn_block(r_self, cfg),
        "ffn": init_ffn_block(r_ffn, cfg),
    }
    if cfg.use_cross_attn:
        params["cross_attn"] = init_cross_attn_block(r_cross, cfg)
    return params


def transformer_block(params, cfg: BlockConfig, x, cross_cond=None,
                      pos_cond=None):
    x = self_attn_block(params["self_attn"], cfg, x, cond=pos_cond)
    if cfg.use_cross_attn:
        x = cross_attn_block(params["cross_attn"], cfg, x, cross_cond,
                             cond=pos_cond)
    return ffn_block(params["ffn"], cfg, x, cond=pos_cond)


def transformer_block_step(params, cfg: BlockConfig, x, cache, index,
                           cross_kv=None, pos_cond=None, packed=None):
    """Single-token decode through a full block (self KV-cached, cross K/V
    precomputed)."""
    x, self_cache = self_attn_block_step(
        params["self_attn"], cfg, x, pos_cond, cache, index, packed=packed)
    if cfg.use_cross_attn:
        x = cross_attn_block(params["cross_attn"], cfg, x, None,
                             cond=pos_cond, precomputed_kv=cross_kv)
    x = ffn_block(params["ffn"], cfg, x, cond=pos_cond)
    return x, self_cache


def self_attn_block_prefill(params, cfg: BlockConfig, x, cond, cache):
    """Causal self-attention over a full prefix (N, P, D), writing the
    prefix K/V into the head-split cache (positions [0, P))."""
    p = x.shape[1]
    x0 = x
    x = block_norm(params["norm"], cfg, x, cond)
    q = project_q(params["attn"], x, cfg.act)
    k, v = project_kv(params["attn"], x, cfg.act)
    from qaig_tpu.ops.attention import transpose_heads_t
    heads = cfg.self_attn_heads
    k_cache = cache["k"].at[:, :, :, :p].set(
        transpose_heads_t(split_heads(k, heads)))
    v_cache = cache["v"].at[:, :, :, :p].set(
        transpose_heads_t(split_heads(v, heads)))
    out = dot_product_attention(q, k, v, cfg.self_attn_heads, causal=True)
    out = residual(params["res"], out, x0, cond, cfg.act)
    return out, {"k": k_cache, "v": v_cache}


def transformer_block_prefill(params, cfg: BlockConfig, x, cache,
                              cross_kv=None, pos_cond=None):
    """Full-prefix pass through a block, filling the self-attn KV cache."""
    x, self_cache = self_attn_block_prefill(
        params["self_attn"], cfg, x, pos_cond, cache)
    if cfg.use_cross_attn:
        x = cross_attn_block(params["cross_attn"], cfg, x, None,
                             cond=pos_cond, precomputed_kv=cross_kv)
    x = ffn_block(params["ffn"], cfg, x, cond=pos_cond)
    return x, self_cache
