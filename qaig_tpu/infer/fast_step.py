"""Op-minimal single-token decode step.

The KV-cached scan step is launch/overhead-bound, not FLOP-bound (wall-clock
attribution: per-step cost is nearly independent of ``hidden_dim`` but rises
with layer count and with the number of small AdaLN ops).  This module
rebuilds the decode step with the fewest possible HLO ops, preserving the
exact math of ``qaig_tpu.models.blocks``:

* every AdaLN-Zero scale/shift and every DiT gate across ALL layers and
  sub-blocks collapses into ONE ``(1, D) @ (D, L*S*3*D)`` matmul on the
  conditioning vector per step (the reference computes 9 separate linears
  per layer, ``models/layers.py:100-153, 291-295``),
* the three 2-layer Q/K/V MLPs fuse into one first-layer matmul + one
  batched second-layer matmul (``blocks.pack_qkv``),
* all per-layer K/V caches merge into a single (L, N, S, 2D) tensor written
  by ONE ``dynamic_update_slice`` per step; attention runs over
  [frozen cache | current token] so the write happens after the layer loop.
"""

import jax
import jax.numpy as jnp

from qaig_tpu.models import core, blocks
from qaig_tpu.ops.attention import (split_heads, merge_heads, NEG_INF,
                                    dot_product_attention)
from qaig_tpu.ops.posemb import sinusoidal_pos_emb


def _stack_linears(linears):
    """[{w (D,D), b (D,)}] -> concatenated (D, n*D), (n*D,)."""
    w = jnp.concatenate([p["w"] for p in linears], axis=1)
    b = jnp.concatenate([p["b"] for p in linears], axis=0)
    return w, b


def pack_step(model, params):
    """Precompute every fused weight the fast step needs (loop-invariant —
    hoisted out of the decode scan by construction)."""
    cfg = model.cfg
    layers = params["decoder_layers"]
    packed = {
        "qkv": [blocks.pack_qkv(p["self_attn"]["attn"]) for p in layers],
    }
    if cfg.use_pos_cond:
        mods = []
        for p in layers:
            for sub in (["self_attn", "cross_attn", "ffn"]
                        if cfg.use_encoder else ["self_attn", "ffn"]):
                block = p[sub]
                mods.append(block["norm"]["scale"])
                mods.append(block["norm"]["shift"])
                mods.append(block["res"]["scale"])
        w, b = _stack_linears(mods)
        packed["mods_w"] = w
        packed["mods_b"] = b
    return packed


def _attention_step(q, k_old, v_old, k_cur, v_cur, heads, index):
    """q (N,1,D) against frozen cache (N,S,D) + current token K/V (N,1,D).

    Frozen positions are valid iff pos < index; the current token is always
    attended (causal self-attention at write position ``index``).
    """
    n, _, d = q.shape
    s = k_old.shape[1]
    dh = d // heads
    scale = 1.0 / (dh ** 0.5)

    qh = split_heads(q, heads)                   # (N,H,1,dh)
    koh = split_heads(k_old, heads)              # (N,H,S,dh)
    voh = split_heads(v_old, heads)
    kch = split_heads(k_cur, heads)              # (N,H,1,dh)
    vch = split_heads(v_cur, heads)

    s_old = jnp.einsum("nhqd,nhkd->nhqk", qh, koh,
                       preferred_element_type=jnp.float32) * scale
    s_cur = jnp.einsum("nhqd,nhkd->nhqk", qh, kch,
                       preferred_element_type=jnp.float32) * scale
    valid = (jnp.arange(s) < index)[None, None, None, :]
    s_old = jnp.where(valid, s_old, NEG_INF)

    scores = jnp.concatenate([s_old, s_cur], axis=-1)   # (N,H,1,S+1)
    w = jax.nn.softmax(scores, axis=-1)
    w_old, w_cur = w[..., :s], w[..., s:]
    out = jnp.einsum("nhqk,nhkd->nhqd", w_old, voh,
                     preferred_element_type=jnp.float32) + \
        jnp.einsum("nhqk,nhkd->nhqd", w_cur, vch,
                   preferred_element_type=jnp.float32)
    return merge_heads(out).astype(q.dtype)


def init_stacked_cache(model, batch, max_len, dtype):
    """(L, N, S, 2D) single-tensor KV cache (this module's own layout —
    unrelated to the engine's head-split per-layer caches)."""
    cfg = model.cfg
    return jnp.zeros((cfg.num_dec_layers, batch, max_len, 2 * cfg.in_dim),
                     dtype)


def fast_decode_step(model, params, packed, token, cache, index,
                     cross_kv=None, pos_cond_value=None):
    """One-token decode over the stacked cache; returns (logits, cache)."""
    cfg = model.cfg
    d = cfg.in_dim
    act = model.dec_block_cfg.act
    n_sub = 3 if cfg.use_encoder else 2

    h = core.embedding_lookup(params["dec_embedding"], token[:, None])
    pos = sinusoidal_pos_emb(d, jnp.asarray(index + 1, jnp.float32)[None])
    h = h + pos[None].astype(h.dtype)

    mods = None
    if cfg.use_pos_cond:
        cond = model.pos_cond_embedding(
            params, jnp.asarray(pos_cond_value, jnp.float32)[None, None])
        flat = (cond @ packed["mods_w"].astype(cond.dtype)
                + packed["mods_b"].astype(cond.dtype))  # (1,1,L*S*3*D)
        mods = flat.reshape(cfg.num_dec_layers, n_sub, 3, 1, 1, d)

    def norm(x, layer, sub, affine_params):
        if mods is None:
            return core.affine_layer_norm(affine_params, x)
        scale, shift, _ = mods[layer, sub]
        return scale.astype(x.dtype) * core.layer_norm(x) \
            + shift.astype(x.dtype)

    def res(p, x, x_skip, layer, sub):
        if mods is not None:
            x = x * mods[layer, sub, 2].astype(x.dtype)
        x = core.linear(p["linear"], x)
        return act(x + x_skip)

    new_kv = []
    for l, layer in enumerate(params["decoder_layers"]):
        # self-attention sub-block
        x0 = h
        xn = norm(h, l, 0, layer["self_attn"]["norm"])
        q, k, v = blocks.packed_qkv(packed["qkv"][l], xn, act)
        old = cache[l]
        attn = _attention_step(q, old[..., :d], old[..., d:], k, v,
                               cfg.self_attn_heads, index)
        h = res(layer["self_attn"]["res"], attn, x0, l, 0)
        new_kv.append(jnp.concatenate([k, v], axis=-1))

        # cross-attention sub-block
        if cfg.use_encoder:
            x0 = h
            xn = norm(h, l, 1, layer["cross_attn"]["norm"])
            q2 = blocks.project_q(layer["cross_attn"]["attn"], xn, act)
            ckv = cross_kv[l]
            attn2 = dot_product_attention(q2, ckv["k"], ckv["v"],
                                          cfg.cross_attn_heads)
            h = res(layer["cross_attn"]["res"], attn2, x0, l, 1)

        # ffn sub-block
        x0 = h
        xn = norm(h, l, n_sub - 1, layer["ffn"]["norm"])
        ff = core.mlp2(layer["ffn"]["ff"], xn, act, act_last=True)
        h = res(layer["ffn"]["res"], ff, x0, l, n_sub - 1)

    stacked_new = jnp.stack(new_kv)  # (L, N, 1, 2D)
    cache = jax.lax.dynamic_update_slice(
        cache, stacked_new.astype(cache.dtype), (0, 0, index, 0))

    logits = model.classify(params, h)[:, 0]
    return logits, cache
