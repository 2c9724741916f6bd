"""Encoder-decoder / decoder-only transformer over codebook tokens.

Capability parity with reference ``models/Transformer.py:16-202``:

* optional vanilla encoder (unmasked blocks, no cross-attn, no AdaLN) over
  coarse-token embeddings,
* DiT-style decoder: masked blocks, cross-attn iff an encoder exists,
  AdaLN-Zero + DiT gating iff position conditioning is on,
* sinusoidal sequence positions start at **1**,
* the position-conditioning vector is a 2-layer MLP over sinusoidal
  embeddings of *absolute patch positions* (sliding-window support),
* classifier head is a 2-layer MLP whose first layer is always silu
  (reference ``Transformer.py:94-102`` uses ``LinearLayer``'s default).

TPU-native design: the full forward is one jittable function with optional
``jax.checkpoint`` rematerialisation per block (the activation-checkpoint
equivalent of ``Transformer.py:142-146, 180-198``); autoregressive decode
goes through ``qaig_tpu.infer.decode`` (KV-cached ``lax.scan``), not this
teacher-forcing path.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from qaig_tpu.models import blocks, core
from qaig_tpu.ops.activations import get_activation
from qaig_tpu.ops.posemb import sinusoidal_pos_emb


@dataclass(frozen=True)
class TransformerConfig:
    use_encoder: bool = True
    use_pos_cond: bool = True
    num_enc_layers: int = 5
    num_dec_layers: int = 10
    num_enc_embedding: int = 512
    num_dec_embedding: int = 512
    self_attn_heads: int = 8
    cross_attn_heads: int = 8
    in_dim: int = 512
    out_dim: int = 512
    hidden_dim: int = 4096
    hidden_activation: str = "silu"
    use_remat: bool = False

    def encoder_block_config(self):
        return blocks.BlockConfig(
            in_dim=self.in_dim,
            hidden_dim=self.hidden_dim,
            self_attn_heads=self.self_attn_heads,
            use_cross_attn=False,
            use_masked_attn=False,
            use_adaln0=False,
            use_scale_layer=False,
            activation_type=self.hidden_activation)

    def decoder_block_config(self):
        return blocks.BlockConfig(
            in_dim=self.in_dim,
            cond_dim=self.in_dim,
            cross_cond_dim=self.in_dim,
            hidden_dim=self.hidden_dim,
            self_attn_heads=self.self_attn_heads,
            cross_attn_heads=self.cross_attn_heads or 8,
            use_cross_attn=self.use_encoder,
            use_masked_attn=True,
            use_adaln0=self.use_pos_cond,
            use_scale_layer=self.use_pos_cond,
            activation_type=self.hidden_activation)


class Transformer:
    def __init__(self, cfg: TransformerConfig):
        self.cfg = cfg
        self.enc_block_cfg = cfg.encoder_block_config()
        self.dec_block_cfg = cfg.decoder_block_config()

    # -- init ---------------------------------------------------------------

    def init(self, rng):
        cfg = self.cfg
        keys = jax.random.split(rng, 6)
        params = {}
        if cfg.use_encoder:
            params["enc_embedding"] = core.init_embedding(
                keys[0], cfg.num_enc_embedding, cfg.in_dim)
            enc_keys = jax.random.split(keys[1], cfg.num_enc_layers)
            params["encoder_layers"] = [
                blocks.init_transformer_block(k, self.enc_block_cfg)
                for k in enc_keys]
        params["dec_embedding"] = core.init_embedding(
            keys[2], cfg.num_dec_embedding, cfg.in_dim)
        dec_keys = jax.random.split(keys[3], cfg.num_dec_layers)
        params["decoder_layers"] = [
            blocks.init_transformer_block(k, self.dec_block_cfg)
            for k in dec_keys]
        if cfg.use_pos_cond:
            params["pos_cond_layer"] = core.init_mlp2(
                keys[4], cfg.in_dim, cfg.hidden_dim, cfg.in_dim)
        params["classifier"] = core.init_mlp2(
            keys[5], cfg.in_dim, cfg.hidden_dim, cfg.out_dim)
        return params

    # -- helpers ------------------------------------------------------------

    def encode(self, params, x_enc):
        """Coarse-token encoder half; returns (N, enc_Seq, D)."""
        cfg = self.cfg
        h = core.embedding_lookup(params["enc_embedding"], x_enc)
        seq = h.shape[1]
        pos = sinusoidal_pos_emb(cfg.in_dim, jnp.arange(1, seq + 1))
        h = h + pos[None].astype(h.dtype)
        block = lambda p, x: blocks.transformer_block(p, self.enc_block_cfg, x)
        if cfg.use_remat:
            block = jax.checkpoint(block)
        for layer_params in params["encoder_layers"]:
            h = block(layer_params, h)
        return h

    def embed_decoder(self, params, x_dec):
        """Decoder token ids -> (N, Seq, D): embedding + sinusoidal
        positions starting at 1 (reference ``Transformer.py:153-167``)."""
        h = core.embedding_lookup(params["dec_embedding"], x_dec)
        seq = h.shape[1]
        pos = sinusoidal_pos_emb(self.cfg.in_dim, jnp.arange(1, seq + 1))
        return h + pos[None].astype(h.dtype)

    def pos_cond_embedding(self, params, pos_cond):
        """(N, Seq) absolute patch positions -> (N, Seq, D) conditioning."""
        cfg = self.cfg
        act = get_activation(cfg.hidden_activation)
        emb = sinusoidal_pos_emb(cfg.in_dim, pos_cond)
        emb = emb.astype(params["pos_cond_layer"]["l0"]["w"].dtype)
        return core.mlp2(params["pos_cond_layer"], emb, act)

    def classify(self, params, h):
        return core.mlp2(params["classifier"], h, get_activation("silu"))

    # -- full teacher-forcing forward --------------------------------------

    def apply(self, params, x_dec, x_enc=None, pos_cond=None):
        """Token ids -> logits (N, Seq, out_dim)."""
        cfg = self.cfg

        enc_out = None
        if cfg.use_encoder:
            enc_out = self.encode(params, x_enc)

        h = self.embed_decoder(params, x_dec)

        pos_cond_emb = None
        if cfg.use_pos_cond:
            pos_cond_emb = self.pos_cond_embedding(params, pos_cond)

        def block(p, x, cross, cond):
            return blocks.transformer_block(
                p, self.dec_block_cfg, x, cross_cond=cross, pos_cond=cond)

        if cfg.use_remat:
            block = jax.checkpoint(block)
        for layer_params in params["decoder_layers"]:
            h = block(layer_params, h, enc_out, pos_cond_emb)

        return self.classify(params, h)

    # -- decode-engine primitives (KV-cached path) --------------------------

    def init_cache(self, batch, max_len, dtype=jnp.float32):
        """Per-decoder-layer self-attention KV caches, stored head-split
        and TRANSPOSED (N, H, dh, S): decode steps never transpose them,
        and S on the lane axis keeps every HBM tile dense (a dh=64 minor
        dim pads to 128 lanes and streams ~2x the bytes — measured 5.8 vs
        1.1 ms per 7-layer step, scripts/probe_layout.py)."""
        heads = self.cfg.self_attn_heads
        shape = (batch, heads, self.cfg.in_dim // heads, max_len)
        return [
            {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
            for _ in range(self.cfg.num_dec_layers)]

    def make_cross_kv(self, params, enc_out):
        """Precompute encoder-side K/V for every decoder layer once per
        sequence (the reference recomputes them every generated token)."""
        if not self.cfg.use_encoder:
            return [None] * self.cfg.num_dec_layers
        return [
            blocks.cross_attn_kv(p["cross_attn"], enc_out,
                                 self.dec_block_cfg.act)
            for p in params["decoder_layers"]]

    def prefill(self, params, tokens, caches, cross_kv=None, pos_cond=None):
        """Run the prefix (N, P) through the decoder, filling KV caches.

        Valid while positions are stable: always for non-sliding models;
        for sliding-window models only before the window first slides (the
        hybrid decode engine enforces this).  ``pos_cond`` is the (N, P)
        absolute-position conditioning when ``use_pos_cond``.  Returns
        (last-position logits (N, out_dim), caches).
        """
        cfg = self.cfg
        h = self.embed_decoder(params, tokens)

        pos_cond_emb = None
        if cfg.use_pos_cond:
            pos_cond_emb = self.pos_cond_embedding(params, pos_cond)

        new_caches = []
        for layer_params, cache, ckv in zip(
                params["decoder_layers"], caches,
                cross_kv or [None] * cfg.num_dec_layers):
            h, cache = blocks.transformer_block_prefill(
                layer_params, self.dec_block_cfg, h, cache, cross_kv=ckv,
                pos_cond=pos_cond_emb)
            new_caches.append(cache)
        return self.classify(params, h[:, -1:])[:, 0], new_caches

    def pack_decode(self, params):
        """Per-layer fused QKV projections for the decode hot path (see
        :func:`qaig_tpu.models.blocks.pack_qkv`).  Computed once per decode
        segment; loop-invariant inside the scan."""
        return [blocks.pack_qkv(p["self_attn"]["attn"])
                for p in params["decoder_layers"]]

    def decode_step(self, params, token, caches, index, cross_kv=None,
                    pos_cond_value=None, packed=None):
        """One-token decode: ``token`` (N,) at absolute position ``index``
        (0-based; scalar, traced ok).  ``pos_cond_value`` is the scalar
        absolute-position conditioning for this token when ``use_pos_cond``.
        Returns (logits (N, out_dim), caches)."""
        cfg = self.cfg
        h = core.embedding_lookup(params["dec_embedding"], token[:, None])
        pos = sinusoidal_pos_emb(
            cfg.in_dim, jnp.asarray(index + 1, jnp.float32)[None])
        h = h + pos[None].astype(h.dtype)

        pos_cond_emb = None
        if cfg.use_pos_cond:
            pos_cond_emb = self.pos_cond_embedding(
                params, jnp.asarray(pos_cond_value, jnp.float32)[None, None])

        new_caches = []
        packed = packed or [None] * cfg.num_dec_layers
        for layer_params, cache, ckv, pk in zip(
                params["decoder_layers"], caches,
                cross_kv or [None] * cfg.num_dec_layers, packed):
            h, cache = blocks.transformer_block_step(
                layer_params, self.dec_block_cfg, h, cache, index,
                cross_kv=ckv, pos_cond=pos_cond_emb, packed=pk)
            new_caches.append(cache)
        return self.classify(params, h)[:, 0], new_caches

    # -- shared-prefix beam decode (rollout fast path) -----------------------

    def presplit_cross_kv(self, cross_kv):
        """(N, S, D) cross K/V -> head-split transposed (N, H, dh, S), done
        once per generation so rollout steps stream dense lane tiles with
        no per-step transpose."""
        from qaig_tpu.ops.attention import split_heads, transpose_heads_t
        heads = self.cfg.cross_attn_heads or self.cfg.self_attn_heads
        out = []
        for ckv in cross_kv:
            if ckv is None:
                out.append(None)
            else:
                out.append(
                    {"k": transpose_heads_t(split_heads(ckv["k"], heads)),
                     "v": transpose_heads_t(split_heads(ckv["v"], heads))})
        return out

    def init_block_cache(self, nb, bw, dtype=jnp.float32):
        """Per-rollout segment K/V blocks: (N*B, H, bw, dh) per layer."""
        heads = self.cfg.self_attn_heads
        shape = (nb, heads, bw, self.cfg.in_dim // heads)
        return [
            {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
            for _ in range(self.cfg.num_dec_layers)]

    def decode_step_shared(self, params, token, shared_caches, block_caches,
                           index0, block_index, cross_kv_split=None,
                           pos_cond_value=None, packed=None):
        """One rollout decode step: ``token`` (N*B,) at absolute position
        ``index0 + block_index``; prefix K/V shared at N rows, segment K/V
        per-rollout.  Returns (logits (N*B, out), block_caches)."""
        from qaig_tpu.ops.attention import (shared_prefix_attention,
                                            shared_cross_attention,
                                            split_heads)
        cfg = self.cfg
        bcfg = self.dec_block_cfg
        index_abs = index0 + block_index

        h = core.embedding_lookup(params["dec_embedding"], token[:, None])
        pos = sinusoidal_pos_emb(
            cfg.in_dim, jnp.asarray(index_abs + 1, jnp.float32)[None])
        h = h + pos[None].astype(h.dtype)

        pos_cond_emb = None
        if cfg.use_pos_cond:
            pos_cond_emb = self.pos_cond_embedding(
                params, jnp.asarray(pos_cond_value, jnp.float32)[None, None])

        packed = packed or [None] * cfg.num_dec_layers
        cross_kv_split = cross_kv_split or [None] * cfg.num_dec_layers
        new_blocks = []
        for layer, shared, block, ckv, pk in zip(
                params["decoder_layers"], shared_caches, block_caches,
                cross_kv_split, packed):
            x0 = h
            xn = blocks.block_norm(layer["self_attn"]["norm"], bcfg, h,
                                   pos_cond_emb)
            if pk is not None:
                q, k, v = blocks.packed_qkv(pk, xn, bcfg.act)
            else:
                q = blocks.project_q(layer["self_attn"]["attn"], xn,
                                     bcfg.act)
                k, v = blocks.project_kv(layer["self_attn"]["attn"], xn,
                                         bcfg.act)
            heads = bcfg.self_attn_heads
            bk = jax.lax.dynamic_update_slice_in_dim(
                block["k"], split_heads(k, heads), block_index, 2)
            bv = jax.lax.dynamic_update_slice_in_dim(
                block["v"], split_heads(v, heads), block_index, 2)
            attn = shared_prefix_attention(
                q, shared["k"], shared["v"], bk, bv, index0, block_index,
                k_scale=shared.get("k_scale"), v_scale=shared.get("v_scale"))
            h = blocks.residual(layer["self_attn"]["res"], attn, x0,
                                pos_cond_emb, bcfg.act)
            new_blocks.append({"k": bk, "v": bv})

            if cfg.use_encoder:
                x0 = h
                xn = blocks.block_norm(layer["cross_attn"]["norm"], bcfg, h,
                                       pos_cond_emb)
                q2 = blocks.project_q(layer["cross_attn"]["attn"], xn,
                                      bcfg.act)
                attn2 = shared_cross_attention(q2, ckv["k"], ckv["v"])
                h = blocks.residual(layer["cross_attn"]["res"], attn2, x0,
                                    pos_cond_emb, bcfg.act)

            h = blocks.ffn_block(layer["ffn"], bcfg, h, cond=pos_cond_emb)

        return self.classify(params, h)[:, 0], new_blocks

    def merge_block_caches(self, shared_caches, block_caches, index0):
        """Write the (selected) per-rollout blocks back into the shared
        TRANSPOSED prefix at slot ``index0`` — one lane-slice update per
        layer per segment.  Quantized prefixes (int8 + per-slot scales)
        quantize the block on merge."""
        from qaig_tpu.ops.attention import transpose_heads_t
        merged = []
        for shared, block in zip(shared_caches, block_caches):
            bk = transpose_heads_t(block["k"])     # (N, H, dh, bw)
            bv = transpose_heads_t(block["v"])
            if "k_scale" in shared:
                from qaig_tpu.ops.kv_quant import quantize_kv_t
                k8, ks = quantize_kv_t(bk)
                v8, vs = quantize_kv_t(bv)
                merged.append({
                    "k": jax.lax.dynamic_update_slice_in_dim(
                        shared["k"], k8, index0, 3),
                    "v": jax.lax.dynamic_update_slice_in_dim(
                        shared["v"], v8, index0, 3),
                    "k_scale": jax.lax.dynamic_update_slice_in_dim(
                        shared["k_scale"], ks, index0, 2),
                    "v_scale": jax.lax.dynamic_update_slice_in_dim(
                        shared["v_scale"], vs, index0, 2),
                })
                continue
            merged.append({
                "k": jax.lax.dynamic_update_slice_in_dim(
                    shared["k"], bk.astype(shared["k"].dtype), index0, 3),
                "v": jax.lax.dynamic_update_slice_in_dim(
                    shared["v"], bv.astype(shared["v"].dtype), index0, 3),
            })
        return merged

    def window_forward_shared(self, params, shared_tokens, block_tokens,
                              shared_pos_cond=None, block_pos_cond=None,
                              cross_kv=None):
        """Sliding-window recompute where the window's leading ``S0`` slots
        are SHARED across B rollouts (beam decode once the window slides).

        The reference's windowed beam decode re-runs the full window for
        every rollout (``generate_images.py:271-286``); but every window slot
        generated before the current segment is identical across the
        ``num_beam`` rollouts of a batch element, so the expensive part of
        the recompute — embedding, K/V and the layer stack over the shared
        slots — runs at N rows here, and only the segment tail (< beam_width
        slots) runs at N*B rows, attending to the shared slots through
        :func:`qaig_tpu.ops.attention.shared_prefix_block_attention`.

        Args:
          shared_tokens: (N, S0) shared leading window slots.
          block_tokens: (N*B, T) per-rollout tail slots (T >= 1); the window
            is their concatenation, ``seq = S0 + T``.
          shared_pos_cond / block_pos_cond: absolute-position conditioning
            per slot when ``use_pos_cond``.
          cross_kv: precomputed encoder K/V at N rows (never tiled).

        Returns final-tail-position logits (N*B, out_dim) — exactly
        ``window_forward(concat window, last_only=True)[:, 0]`` per rollout.
        """
        from qaig_tpu.ops.attention import (dot_product_attention,
                                            shared_cross_attention,
                                            shared_prefix_block_attention,
                                            split_heads)
        cfg = self.cfg
        bcfg = self.dec_block_cfg
        n, s0 = shared_tokens.shape
        nb, t = block_tokens.shape
        seq = s0 + t
        heads = cfg.self_attn_heads

        hs = core.embedding_lookup(params["dec_embedding"], shared_tokens)
        hb = core.embedding_lookup(params["dec_embedding"], block_tokens)
        pos = sinusoidal_pos_emb(cfg.in_dim, jnp.arange(1, seq + 1))
        hs = hs + pos[None, :s0].astype(hs.dtype)
        hb = hb + pos[None, s0:].astype(hb.dtype)

        cond_s = cond_b = None
        if cfg.use_pos_cond:
            cond_s = self.pos_cond_embedding(params, shared_pos_cond)
            cond_b = self.pos_cond_embedding(params, block_pos_cond)

        cross_kv = cross_kv or [None] * cfg.num_dec_layers
        cross_heads = cfg.cross_attn_heads or heads
        n_layers = cfg.num_dec_layers
        for i, (layer, ckv) in enumerate(
                zip(params["decoder_layers"], cross_kv)):
            last = i == n_layers - 1
            sa = layer["self_attn"]

            # -- self-attention: shared stream stays at N rows ------------
            hs_n = blocks.block_norm(sa["norm"], bcfg, hs, cond_s)
            hb_n = blocks.block_norm(sa["norm"], bcfg, hb, cond_b)
            k_s, v_s = blocks.project_kv(sa["attn"], hs_n, bcfg.act)
            k_b, v_b = blocks.project_kv(sa["attn"], hb_n, bcfg.act)
            if not last:
                q_s = blocks.project_q(sa["attn"], hs_n, bcfg.act)
                attn_s = dot_product_attention(q_s, k_s, v_s, heads,
                                               causal=True)
                hs = blocks.residual(sa["res"], attn_s, hs, cond_s, bcfg.act)
            # last layer: only the final tail query feeds the classifier
            q_b = blocks.project_q(sa["attn"],
                                   hb_n[:, -1:] if last else hb_n, bcfg.act)
            x0b = hb[:, -1:] if last else hb
            if last and cond_b is not None:
                cond_b = cond_b[:, -1:]
            attn_b = shared_prefix_block_attention(
                q_b, split_heads(k_s, heads), split_heads(v_s, heads),
                split_heads(k_b, heads), split_heads(v_b, heads))
            hb = blocks.residual(sa["res"], attn_b, x0b, cond_b, bcfg.act)

            # -- cross-attention (precomputed encoder K/V at N rows) ------
            if cfg.use_encoder:
                if not last:
                    hs = blocks.cross_attn_block(
                        layer["cross_attn"], bcfg, hs, None, cond=cond_s,
                        precomputed_kv=ckv)
                ca = layer["cross_attn"]
                x0b = hb
                hb_n2 = blocks.block_norm(ca["norm"], bcfg, hb, cond_b)
                q2 = blocks.project_q(ca["attn"], hb_n2, bcfg.act)
                from qaig_tpu.ops.attention import transpose_heads_t
                attn2 = shared_cross_attention(
                    q2,
                    transpose_heads_t(split_heads(ckv["k"], cross_heads)),
                    transpose_heads_t(split_heads(ckv["v"], cross_heads)))
                hb = blocks.residual(ca["res"], attn2, x0b, cond_b, bcfg.act)

            # -- feedforward ----------------------------------------------
            if not last:
                hs = blocks.ffn_block(layer["ffn"], bcfg, hs, cond=cond_s)
            hb = blocks.ffn_block(layer["ffn"], bcfg, hb, cond=cond_b)

        return self.classify(params, hb)[:, 0]

    def window_forward(self, params, tokens, pos_cond=None, cross_kv=None,
                       last_only=False):
        """Full decoder forward over a fixed window with *precomputed* cross
        K/V — the sliding-window decode path (window-relative positions make
        KV caching across slides invalid, so the window is recomputed, but
        encoder K/V never is).

        ``last_only``: decode only samples from the final position, so the
        final layer restricts its query (and its cross-attn/FFN) to that
        position and the classifier runs once — exact, since the last
        layer's non-final outputs feed nothing downstream.  Returns
        all-position logits, or (N, 1, out_dim) when ``last_only``.
        """
        cfg = self.cfg
        h = self.embed_decoder(params, tokens)
        seq = h.shape[1]

        pos_cond_emb = None
        if cfg.use_pos_cond:
            pos_cond_emb = self.pos_cond_embedding(params, pos_cond)

        cross_kv = cross_kv or [None] * cfg.num_dec_layers
        n_layers = cfg.num_dec_layers
        for i, (layer_params, ckv) in enumerate(
                zip(params["decoder_layers"], cross_kv)):
            final = last_only and i == n_layers - 1
            if final:
                # last layer: all positions feed K/V, only the final query
                # is consumed
                bcfg = self.dec_block_cfg
                x0 = h[:, -1:]
                xn = blocks.block_norm(
                    layer_params["self_attn"]["norm"], bcfg, h,
                    pos_cond_emb)
                q = blocks.project_q(layer_params["self_attn"]["attn"],
                                     xn[:, -1:], bcfg.act)
                k, v = blocks.project_kv(layer_params["self_attn"]["attn"],
                                         xn, bcfg.act)
                cond_last = (pos_cond_emb[:, -1:]
                             if pos_cond_emb is not None else None)
                from qaig_tpu.ops.attention import dot_product_attention
                attn = dot_product_attention(
                    q, k, v, bcfg.self_attn_heads, causal=True,
                    q_offset=seq - 1)
                h = blocks.residual(layer_params["self_attn"]["res"], attn,
                                    x0, cond_last, bcfg.act)
                if cfg.use_encoder:
                    h = blocks.cross_attn_block(
                        layer_params["cross_attn"], bcfg, h, None,
                        cond=cond_last, precomputed_kv=ckv)
                h = blocks.ffn_block(layer_params["ffn"], bcfg, h,
                                     cond=cond_last)
            else:
                h = blocks.self_attn_block(
                    layer_params["self_attn"], self.dec_block_cfg, h,
                    cond=pos_cond_emb)
                if cfg.use_encoder:
                    h = blocks.cross_attn_block(
                        layer_params["cross_attn"], self.dec_block_cfg, h,
                        None, cond=pos_cond_emb, precomputed_kv=ckv)
                h = blocks.ffn_block(layer_params["ffn"], self.dec_block_cfg,
                                     h, cond=pos_cond_emb)
        return self.classify(params, h)
