"""Autoregressive decode engine.

TPU-native replacement for the reference decode loops
(``train_quantized_transformer.py:610-654`` and ``generate_images.py:
256-337``), which re-run the transformer over the whole context window for
every generated token with no KV cache.

Engines:

* **KV-cached** (``use_pos_cond=False``): prefill + ``lax.scan`` of
  single-token steps against per-layer KV caches — O(Seq) attention per
  token instead of the reference's O(Seq^2) recompute.
* **Hybrid sliding-window** (``use_pos_cond=True``): while the context is
  shorter than the window, positions are stable, so the KV-cached path is
  *exactly* equivalent to the reference's full-context forward (with the
  token's absolute position as AdaLN conditioning).  Once the window starts
  sliding, every token's window-relative sinusoidal position changes each
  step, which invalidates all cached K/V — the engine switches to a
  static-shape window-recompute scan.  The reference's steady-state slice is
  ``sliding_window - 1`` tokens (it advances the start index *before* the
  forward, ``train_quantized_transformer.py:613-620``), reproduced here with
  a (W-1)-slot ring buffer.

Sampling semantics preserved from the reference:

* temperature softmax + categorical sampling,
* ``end_mode='mask'``: the <end> probability is zeroed before sampling and
  the chosen token's *unrenormalized* probability enters the rollout score
  (``generate_images.py:291-304``),
* ``end_mode='replace_zero'``: sample from the full distribution, then remap
  <end> -> 0 (training-preview hack, ``train_quantized_transformer.py:636``),
* ``index_shift``: base-model context tokens live in the combined LR+HR
  vocabulary (``generate_images.py:306-308``),
* rollout "beam search": best of ``num_beam`` independent ``beam_width``-
  token continuations per batch element (``generate_images.py:262-337``),
  run here as one batched decode over an N*num_beam batch axis.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplerSettings:
    temperature: float = 1.0
    end_token: int = -1         # vocabulary index of <end> (= hr_K)
    end_mode: str = "mask"      # 'mask' | 'replace_zero' | 'none'
    index_shift: int = 0        # added to sampled tokens before re-feeding
    # Position-conditioning value for a GENERATED token at slot i is
    # i + pos_offset.  The reference's training preview uses pos == slot
    # (``train_quantized_transformer.py:648-652``: step+1 at slot step+1)
    # but its generation loop appends curr_num_seq + token_count + 1
    # (``generate_images.py:315-319``) == slot + 1 — an off-by-one quirk
    # generate/CascadePipeline reproduce with pos_offset=1.
    pos_offset: int = 0


@dataclass
class DecodeState:
    """Python-side wrapper: ``arrays`` is the jit-carried pytree; the mode
    switch (cached -> windowed) and the cache-growth schedule are statically
    determined from the Python counters, so every jitted segment has static
    shapes."""
    mode: str                   # 'cached' | 'windowed'
    arrays: dict
    init_len: int
    gen_count: int = 0
    window: int = None          # sliding_window (pos-cond models only)
    cache_len: int = 0          # current KV cache capacity (cached mode)
    total_len: int = 0          # final capacity the generation needs


FIRST_BUCKET = 64


def _bucket_schedule(needed, total):
    """Next cache capacity: doubling buckets, clipped to the final total.
    Decode cost scales with cache length (attention reads the whole buffer
    every step), so small prefixes shouldn't pay for the full sequence."""
    cap = FIRST_BUCKET
    while cap < needed:
        cap *= 2
    return min(cap, total) if needed <= total else needed


def _sample(logits, rng, s: SamplerSettings, slot=None):
    """Returns (context_token (N,), chosen_prob (N,)).

    ``rng`` is either ONE key for the whole batch (batch-keyed mode: the
    historical CLI semantics — all rows draw from one categorical call) or
    PER-ROW keys (rows, 2) (row-keyed mode: each row's draw depends only
    on its own key and ``slot``, the global context index of the token
    being generated — composition-invariant serving sampling; see
    ``rollout_generate(row_keys=...)``)."""
    scaled = logits.astype(jnp.float32) / s.temperature
    probs = jax.nn.softmax(scaled, axis=-1)
    if s.end_mode == "mask":
        probs = probs.at[:, s.end_token].set(0.0)
        sample_logits = jnp.log(jnp.maximum(probs, 1e-38))
    else:
        sample_logits = scaled
    if _is_row_keys(rng):
        step_keys = jax.vmap(
            lambda k: jax.random.fold_in(k, slot))(rng)
        token = jax.vmap(jax.random.categorical)(step_keys, sample_logits)
    else:
        token = jax.random.categorical(rng, sample_logits, axis=-1)
    chosen = jnp.take_along_axis(probs, token[:, None], axis=-1)[:, 0]
    if s.end_mode == "replace_zero":
        token = jnp.where(token == s.end_token, 0, token)
    token = token + s.index_shift
    return token, chosen


def _is_row_keys(rng):
    """True when ``rng`` is a (rows, 2) stack of per-row PRNG keys rather
    than a single (2,) key."""
    return rng.ndim == 2


def _expand_row_keys(row_keys, num_beam):
    """Per-element keys (N, 2) -> per-rollout keys (N*num_beam, 2), beam
    ``b`` of element ``n`` getting ``fold_in(row_keys[n], b)`` — the row
    grouping matches ``_tile`` ([n0b0, n0b1, ..., n1b0, ...])."""
    beams = jnp.arange(num_beam, dtype=jnp.int32)
    out = jax.vmap(lambda k: jax.vmap(
        lambda b: jax.random.fold_in(k, b))(beams))(row_keys)
    return out.reshape((row_keys.shape[0] * num_beam,) + row_keys.shape[1:])


def _tile(tree, reps):
    """Repeat rows: (N, ...) -> (N*reps, ...) as a pure broadcast+reshape
    (jnp.repeat lowers to a slow gather on TPU at cache sizes)."""
    def t(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        out = jnp.broadcast_to(x[:, None], (x.shape[0], reps) + x.shape[1:])
        return out.reshape((x.shape[0] * reps,) + x.shape[1:])
    return jax.tree_util.tree_map(t, tree)


def _select_beam(tree, winner, num_beam):
    """Gather the winning rollout's rows from (N*B, ...) leaves.

    Floating leaves (the big KV caches) use a one-hot contraction — a dense
    multiply-reduce the TPU executes at full bandwidth, where
    ``take_along_axis``'s general gather is orders of magnitude slower.
    Small integer leaves keep the gather path.
    """
    n = winner.shape[0]
    onehot = jax.nn.one_hot(winner, num_beam)  # (N, B) f32

    def pick(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        xr = x.reshape((n, num_beam) + x.shape[1:])
        if jnp.issubdtype(x.dtype, jnp.floating):
            out = jnp.einsum("nb,nb...->n...", onehot.astype(x.dtype), xr)
            return out.astype(x.dtype)
        idx = winner.reshape((n,) + (1,) * (xr.ndim - 1))
        idx = jnp.broadcast_to(idx, (n, 1) + xr.shape[2:])
        return jnp.take_along_axis(xr, idx, axis=1)[:, 0]
    return jax.tree_util.tree_map(pick, tree)


class DecodeEngine:
    def __init__(self, model, quantized_prefix=False,
                 legacy_windowed_rollouts=False, flat_decode=False):
        # quantized_prefix: store the rollout decode's SHARED prefix K/V
        # int8 with per-slot scales (ops/kv_quant.py) — halves the dominant
        # HBM stream of beam decode at a small numeric cost (serving
        # option; exact bf16 is the default).  Only rollout_generate uses
        # it; single-path decode stays exact.
        # legacy_windowed_rollouts: force the tile-everything fallback for
        # sliding-window beam segments instead of the shared windowed path
        # (A/B testing; also used automatically when beam_width >= window).
        # flat_decode: route rollout-segment attention through the
        # interleaved flat Pallas kernel (ops/decode_attention.py) — the
        # per-segment cache read becomes an interleave instead of a plain
        # slice, and each step's attention reads it directly in-kernel.
        # Requires a TPU backend; combined with quantized_prefix the int8
        # dequantization happens in-kernel (no materialized bf16 copy).
        self.model = model
        self.quantized_prefix = quantized_prefix
        self.legacy_windowed_rollouts = legacy_windowed_rollouts
        self.flat_decode = flat_decode
        self._jit_cache = {}

    def _flat_segment(self, num_beam, block_width):
        """Whether this rollout segment's attention goes through the flat
        Pallas kernel: engine opt-in AND static shapes the kernel supports
        (``ops/decode_attention.flat_segment_supported``) — e.g. stage-0
        beam fans (32 rollouts) and non-aligned crossing block widths fall
        back to the XLA transposed path."""
        if not self.flat_decode:
            return False
        from qaig_tpu.ops.decode_attention import flat_segment_supported
        return flat_segment_supported(
            self.model.cfg.self_attn_heads, num_beam, block_width)

    def _read_views(self, caches, read_len, flat=False):
        """Per-segment read views of the shared prefix caches, statically
        sliced to ``read_len`` slots and FORCE-MATERIALIZED.

        The in-scan attention must read a fresh intermediate whose layout
        XLA picks for streaming; left to itself, layout assignment
        sometimes elides the slice (``read_len == cap``) or fuses it into
        every scan step, re-streaming the badly-laid-out parameter buffer
        at ~5x the cost — measured 5.8 vs 1.1 ms per 7-layer step at bench
        shapes (scripts/probe_slice.py, scripts/probe_cap2 in
        docs/PERFORMANCE.md).  ``+ 0`` under an optimization barrier pins
        the copy.  With ``flat`` the copy is instead the flat Pallas
        kernel's interleaved (N, dh, S*H) layout."""
        views = [{key: value[..., :read_len] for key, value in c.items()}
                 for c in caches]
        if flat:
            from qaig_tpu.ops.decode_attention import (interleave_t,
                                                       interleave_scale)
            return [
                dict({"k": interleave_t(c["k"]),
                      "v": interleave_t(c["v"])},
                     **({"k_scale": interleave_scale(c["k_scale"]),
                         "v_scale": interleave_scale(c["v_scale"])}
                        if "k_scale" in c else {}))
                for c in views]
        views = [{key: value + 0 for key, value in c.items()}
                 for c in views]
        return jax.lax.optimization_barrier(views)

    def _quantize_prefix(self, arrays):
        from qaig_tpu.ops.kv_quant import quantize_caches

        def build():
            def fn(arrays):
                return dict(arrays, caches=quantize_caches(arrays["caches"]))
            return fn
        key = ("quantize", arrays["caches"][0]["k"].shape)
        return self._jitted(key, build)(arrays)

    def _dequantize_prefix(self, arrays):
        from qaig_tpu.ops.kv_quant import dequantize_caches
        if "k_scale" not in arrays["caches"][0]:
            return arrays

        def build():
            def fn(arrays):
                return dict(arrays,
                            caches=dequantize_caches(arrays["caches"]))
            return fn
        key = ("dequantize", arrays["caches"][0]["k"].shape)
        return self._jitted(key, build)(arrays)

    def _jitted(self, key, builder):
        # NOTE: segment inputs are deliberately NOT donated — states are
        # plain pytrees a caller may hold/reuse, and a measured A/B showed
        # donation saves only ~1% on the unfused path (XLA already aliases
        # the cache updates inside each segment program).
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(builder())
        return self._jit_cache[key]

    # ------------------------------------------------------------------
    # cached state init / segment
    # ------------------------------------------------------------------

    def _cached_init(self, params, init_tokens, total_len, x_enc, ctx_size):
        """Prefill.  ``ctx_size``: when >0 (pos-cond models), keep a token
        context ring of that size for the later window conversion."""
        model = self.model
        use_pos = model.cfg.use_pos_cond

        def build():
            def fn(params, init_tokens, x_enc):
                init_tokens = init_tokens.astype(jnp.int32)
                n, p = init_tokens.shape
                cross_kv = None
                if model.cfg.use_encoder:
                    enc_out = model.encode(params, x_enc)
                    cross_kv = model.make_cross_kv(params, enc_out)
                caches = model.init_cache(
                    n, total_len, params["dec_embedding"]["w"].dtype)
                # Pre-slide positions == absolute slot indices 0..P-1 (the
                # reference's zero start generalized to multi-token grids,
                # e.g. base mode with a full LR conditioning grid,
                # ``train_quantized_transformer.py:583-590``).
                pos_cond = (jnp.broadcast_to(
                    jnp.arange(p, dtype=jnp.float32)[None], (n, p))
                    if use_pos else None)
                logits, caches = model.prefill(params, init_tokens, caches,
                                               cross_kv=cross_kv,
                                               pos_cond=pos_cond)
                state = {"caches": caches, "cross_kv": cross_kv,
                         "logits": logits,
                         "index": jnp.asarray(p, jnp.int32)}
                if ctx_size:
                    ctx = jnp.zeros((n, ctx_size), jnp.int32)
                    state["ctx"] = ctx.at[:, :p].set(init_tokens)
                return state
            return fn

        key = ("cached_init", init_tokens.shape, total_len, ctx_size,
               None if x_enc is None else x_enc.shape)
        return self._jitted(key, build)(params, init_tokens, x_enc)

    def _cached_segment(self, params, arrays, rng, num_steps,
                        settings: SamplerSettings):
        model = self.model
        use_pos = model.cfg.use_pos_cond
        has_ctx = "ctx" in arrays

        def build():
            def fn(params, arrays, rng):
                packed = model.pack_decode(params)
                row_mode = _is_row_keys(rng)

                def body(carry, xs):
                    logits, caches, index, ctx, logp = carry
                    if row_mode:
                        token, p = _sample(logits, rng, settings, slot=index)
                    else:
                        token, p = _sample(logits, xs, settings)
                    if has_ctx:
                        ctx = jax.lax.dynamic_update_slice(
                            ctx, token[:, None].astype(jnp.int32), (0, index))
                    # While unslid, a generated token's position is its slot
                    # index (+ the sampler's generation offset).
                    pos_val = (index + settings.pos_offset) if use_pos \
                        else None
                    logits, caches = model.decode_step(
                        params, token, caches, index,
                        cross_kv=arrays["cross_kv"], pos_cond_value=pos_val,
                        packed=packed)
                    return ((logits, caches, index + 1, ctx,
                             logp + jnp.log(jnp.maximum(p, 1e-38))), token)

                keys = (jnp.arange(num_steps) if row_mode
                        else jax.random.split(rng, num_steps))
                n = arrays["logits"].shape[0]
                carry = (arrays["logits"], arrays["caches"], arrays["index"],
                         arrays.get("ctx", jnp.zeros((n, 1), jnp.int32)),
                         jnp.zeros(n))
                (logits, caches, index, ctx, logp), tokens = jax.lax.scan(
                    body, carry, keys)
                new_arrays = dict(arrays, caches=caches, logits=logits,
                                  index=index)
                if has_ctx:
                    new_arrays["ctx"] = ctx
                return new_arrays, tokens.T, logp
            return fn

        key = ("cached_seg", num_steps, settings, has_ctx,
               arrays["logits"].shape, rng.shape)
        return self._jitted(key, build)(params, arrays, rng)

    # ------------------------------------------------------------------
    # shared-prefix rollout segment (beam fast path)
    # ------------------------------------------------------------------

    def _rollout_segment(self, params, arrays, rng, beam_width, num_beam,
                         settings: SamplerSettings, prefix_len=None):
        """One best-of-B segment with the prefix KV cache SHARED across
        rollouts: only (N*B, H, bw, dh) per-rollout blocks are created,
        selected, and merged back — the legacy path tiled and re-gathered
        every full cache.  Selection happens in-jit; returns
        (new shared arrays, winning tokens (N, bw)).

        ``prefix_len``: the exact prefix length (static Python counter).
        Attention reads are statically sliced to the next multiple of 32
        instead of streaming the whole bucket capacity — the bucketed
        growth schedule otherwise wastes up to ~2x HBM bandwidth on
        masked-out slots right after a regrow."""
        model = self.model
        use_pos = model.cfg.use_pos_cond
        has_ctx = "ctx" in arrays
        cap = arrays["caches"][0]["k"].shape[-1]
        read_len = cap if prefix_len is None \
            else min(cap, -(-prefix_len // 32) * 32)

        def build():
            def fn(params, arrays, rng):
                n = arrays["logits"].shape[0]
                nb = n * num_beam
                index0 = arrays["index"]
                row_mode = _is_row_keys(rng)
                rollout_keys = (_expand_row_keys(rng, num_beam)
                                if row_mode else None)
                packed = model.pack_decode(params)
                cross_split = model.presplit_cross_kv(arrays["cross_kv"]) \
                    if model.cfg.use_encoder else None
                block_caches = model.init_block_cache(
                    nb, beam_width, params["dec_embedding"]["w"].dtype)
                # slot axis is the LAST dim for both the transposed caches
                # (N, H, dh, S) and their int8 scales (N, H, S)
                read_caches = self._read_views(
                    arrays["caches"], read_len,
                    flat=self._flat_segment(num_beam, beam_width))

                logits0 = _tile({"x": arrays["logits"]}, num_beam)["x"]
                ctx0 = (_tile({"x": arrays["ctx"]}, num_beam)["x"]
                        if has_ctx else jnp.zeros((nb, 1), jnp.int32))

                def body(carry, xs):
                    logits, blocks_, j, ctx, logp = carry
                    if row_mode:
                        token, p = _sample(logits, rollout_keys, settings,
                                           slot=index0 + j)
                    else:
                        token, p = _sample(logits, xs, settings)
                    if has_ctx:
                        ctx = jax.lax.dynamic_update_slice(
                            ctx, token[:, None].astype(jnp.int32),
                            (0, index0 + j))
                    pos_val = (index0 + j + settings.pos_offset) if use_pos \
                        else None
                    logits, blocks_ = model.decode_step_shared(
                        params, token, read_caches, blocks_,
                        index0, j, cross_kv_split=cross_split,
                        pos_cond_value=pos_val, packed=packed)
                    return ((logits, blocks_, j + 1, ctx,
                             logp + jnp.log(jnp.maximum(p, 1e-38))), token)

                keys = (jnp.arange(beam_width) if row_mode
                        else jax.random.split(rng, beam_width))
                carry = (logits0, block_caches, jnp.asarray(0, jnp.int32),
                         ctx0, jnp.zeros(nb))
                (logits, blocks_, _, ctx, logp), tokens = jax.lax.scan(
                    body, carry, keys)
                tokens = tokens.T  # (N*B, bw)

                winner = jnp.argmax(logp.reshape(n, num_beam), axis=1)
                sel = _select_beam(
                    {"logits": logits, "tokens": tokens, "ctx": ctx,
                     "blocks": blocks_}, winner, num_beam)
                caches = model.merge_block_caches(
                    arrays["caches"], sel["blocks"], index0)
                new_arrays = dict(arrays, caches=caches,
                                  logits=sel["logits"],
                                  index=index0 + beam_width)
                if has_ctx:
                    new_arrays["ctx"] = sel["ctx"]
                return new_arrays, sel["tokens"]
            return fn

        key = ("rollout_seg", beam_width, num_beam, settings, has_ctx,
               arrays["logits"].shape,
               arrays["caches"][0]["k"].shape,
               str(arrays["caches"][0]["k"].dtype), read_len, rng.shape)
        return self._jitted(key, build)(params, arrays, rng)

    # ------------------------------------------------------------------
    # shared windowed rollout segment (crossing + steady sliding phases)
    # ------------------------------------------------------------------

    def _windowed_rollout_segment(self, params, arrays, rng, beam_width,
                                  num_beam, settings: SamplerSettings,
                                  n_cached, window, init_len, gen0, kind):
        """One best-of-B segment once the sliding window is (or becomes)
        active, with the window's SHARED slots kept at N rows.

        ``kind='crossing'``: the segment starts in cached mode (arrays are
        the cached-state kind) — the first ``n_cached`` steps run through the
        shared-prefix KV path, the rest through shared windowed recompute
        (``window_forward_shared``).  ``kind='steady'``: the window already
        slid (arrays are the windowed kind, ``n_cached == 0``).

        The legacy path tiled the ENTIRE state by ``num_beam`` and re-ran
        the full (W-1)-token window at N*B rows per windowed step; here only
        the per-rollout segment tail is at N*B rows — the window recompute's
        embedding/KV/layer stack over shared slots runs once per batch
        element.  Selection is in-jit.  Returns (windowed-kind arrays for
        the selected rollout, winning tokens (N, bw))."""
        model = self.model
        use_pos = model.cfg.use_pos_cond
        crossing = kind == "crossing"
        c0 = init_len + gen0  # context length at segment start

        def build():
            def fn(params, arrays, rng):
                row_mode = _is_row_keys(rng)
                keys = (None if row_mode
                        else jax.random.split(rng, beam_width))
                rollout_keys = (_expand_row_keys(rng, num_beam)
                                if row_mode else None)
                if crossing:
                    n = arrays["logits"].shape[0]
                else:
                    n = arrays["tok_buf"].shape[0]
                nb = n * num_beam
                cross_kv = arrays["cross_kv"]

                if crossing:
                    ctx = arrays["ctx"]
                    # position value of context slot j: conditioning-grid
                    # slots keep pos == slot, generated slots get the
                    # sampler's generation offset (_windowed_from_cached).
                    slots = jnp.arange(c0, dtype=jnp.float32)
                    pos_full = slots + jnp.where(
                        slots >= init_len, float(settings.pos_offset), 0.0)
                    pos0 = arrays["index"].astype(jnp.float32) \
                        + settings.pos_offset
                else:
                    tok_shared = arrays["tok_buf"]
                    pos_shared_full = arrays["pos_buf"]
                    pos0 = arrays["pos_next"].astype(jnp.float32)

                logp = jnp.zeros(nb)
                seg_tokens = jnp.zeros((nb, 0), jnp.int32)

                # -- part A: pre-slide steps via the shared-prefix KV path
                if n_cached > 0:
                    packed = model.pack_decode(params)
                    cross_split = model.presplit_cross_kv(cross_kv) \
                        if model.cfg.use_encoder else None
                    block_caches = model.init_block_cache(
                        nb, n_cached, params["dec_embedding"]["w"].dtype)
                    logits0 = _tile({"x": arrays["logits"]}, num_beam)["x"]
                    index0 = arrays["index"]
                    cap = arrays["caches"][0]["k"].shape[-1]
                    read_len = min(cap, -(-c0 // 32) * 32)
                    read_caches = self._read_views(
                        arrays["caches"], read_len,
                        flat=self._flat_segment(num_beam, n_cached))

                    def body(carry, xs):
                        logits, blocks_, j, lp = carry
                        if row_mode:
                            token, p = _sample(logits, rollout_keys,
                                               settings, slot=c0 + j)
                        else:
                            token, p = _sample(logits, xs, settings)
                        pos_val = (index0 + j + settings.pos_offset) \
                            if use_pos else None
                        logits, blocks_ = model.decode_step_shared(
                            params, token, read_caches, blocks_,
                            index0, j, cross_kv_split=cross_split,
                            pos_cond_value=pos_val, packed=packed)
                        return ((logits, blocks_, j + 1,
                                 lp + jnp.log(jnp.maximum(p, 1e-38))), token)

                    carry = (logits0, block_caches,
                             jnp.asarray(0, jnp.int32), logp)
                    (logits, _, _, logp), toks = jax.lax.scan(
                        body, carry,
                        jnp.arange(n_cached) if row_mode
                        else keys[:n_cached])
                    seg_tokens = toks.T.astype(jnp.int32)

                # -- part B: slid steps via shared windowed recompute
                for s in range(n_cached, beam_width):
                    s0 = window - 1 - s
                    if crossing:
                        sh_tok = ctx[:, c0 - s0:c0]
                        sh_pos = jnp.broadcast_to(
                            pos_full[None, c0 - s0:c0], (n, s0)) \
                            if use_pos else None
                    else:
                        sh_tok = tok_shared[:, s:]
                        sh_pos = pos_shared_full[:, s:] if use_pos else None
                    if s == 0:
                        logits_n = model.window_forward(
                            params, sh_tok, pos_cond=sh_pos,
                            cross_kv=cross_kv, last_only=True)[:, 0]
                        logits = _tile({"x": logits_n}, num_beam)["x"]
                    else:
                        blk_pos = (pos0 + jnp.arange(s, dtype=jnp.float32))
                        blk_pos = jnp.broadcast_to(blk_pos[None], (nb, s)) \
                            if use_pos else None
                        logits = model.window_forward_shared(
                            params, sh_tok, seg_tokens,
                            shared_pos_cond=sh_pos, block_pos_cond=blk_pos,
                            cross_kv=cross_kv)
                    if row_mode:
                        token, p = _sample(logits, rollout_keys, settings,
                                           slot=c0 + s)
                    else:
                        token, p = _sample(logits, keys[s], settings)
                    logp = logp + jnp.log(jnp.maximum(p, 1e-38))
                    seg_tokens = jnp.concatenate(
                        [seg_tokens, token[:, None].astype(jnp.int32)],
                        axis=1)

                # -- in-jit selection, then rebuild the windowed state
                winner = jnp.argmax(logp.reshape(n, num_beam), axis=1)
                sel = _select_beam({"tokens": seg_tokens}, winner,
                                   num_beam)["tokens"]

                keep = (window - 1) - beam_width  # shared slots that remain
                if crossing:
                    tail_tok = ctx[:, c0 - keep:c0]
                    tail_pos = jnp.broadcast_to(
                        pos_full[None, c0 - keep:c0], (n, keep))
                else:
                    tail_tok = tok_shared[:, beam_width:]
                    tail_pos = pos_shared_full[:, beam_width:]
                new_pos = pos0 + jnp.arange(beam_width, dtype=jnp.float32)
                new_arrays = {
                    "tok_buf": jnp.concatenate([tail_tok, sel], axis=1),
                    "pos_buf": jnp.concatenate(
                        [tail_pos,
                         jnp.broadcast_to(new_pos[None], (n, beam_width))],
                        axis=1),
                    "cross_kv": cross_kv,
                    "pos_next": (pos0 + beam_width).astype(jnp.int32),
                }
                return new_arrays, sel
            return fn

        if crossing:
            # init_len and gen0 are traced INTO the crossing program (the
            # pos_full ``slots >= init_len`` offset split and c0 slicing),
            # so they are part of its cache key — same-c0 prompts with
            # different conditioning-grid lengths must not share a program.
            # The steady trace depends on neither (positions come from the
            # carried buffers), and keying it on gen0 would force a
            # recompile per segment.
            shapes = (arrays["logits"].shape, arrays["ctx"].shape,
                      arrays["caches"][0]["k"].shape,
                      str(arrays["caches"][0]["k"].dtype), init_len, gen0)
        else:
            shapes = (arrays["tok_buf"].shape,)
        key = ("winroll_seg", kind, beam_width, num_beam, n_cached, settings,
               window, shapes, rng.shape)
        return self._jitted(key, build)(params, arrays, rng)

    # ------------------------------------------------------------------
    # windowed state / segment
    # ------------------------------------------------------------------

    def _windowed_from_cached(self, arrays, window, init_len, gen_count,
                              pos_offset=0):
        """Static conversion at the first slide: context length == window;
        the reference drops the first token and runs on the remaining
        (window - 1) with their absolute positions (conditioning-grid slots
        keep pos == slot; generated slots get the sampler's generation
        offset).  ``pos_next`` is the position of the next generated
        token."""
        ctx = arrays["ctx"]
        n = ctx.shape[0]
        tok_buf = ctx[:, 1:window]
        slots = jnp.arange(1, window, dtype=jnp.float32)
        pos = slots + jnp.where(slots >= init_len, float(pos_offset), 0.0)
        pos_buf = jnp.broadcast_to(pos[None], (n, window - 1))
        return {"tok_buf": tok_buf, "pos_buf": pos_buf,
                "cross_kv": arrays["cross_kv"],
                "pos_next": jnp.asarray(init_len + gen_count + pos_offset,
                                        jnp.int32)}

    def _windowed_segment(self, params, arrays, rng, num_steps,
                          settings: SamplerSettings):
        """Steady-state sliding decode over a full (W-1)-slot buffer."""
        model = self.model
        buf_len = arrays["tok_buf"].shape[1]

        def build():
            def fn(params, arrays, rng):
                cross_kv = arrays["cross_kv"]
                row_mode = _is_row_keys(rng)

                def body(carry, xs):
                    tok_buf, pos_buf, pos_next, logp = carry
                    logits = model.window_forward(
                        params, tok_buf, pos_cond=pos_buf, cross_kv=cross_kv,
                        last_only=True)[:, 0]
                    if row_mode:
                        # pos_next is the absolute context slot of the token
                        # being generated, shifted by the sampler's offset
                        token, prob = _sample(
                            logits, rng, settings,
                            slot=pos_next - settings.pos_offset)
                    else:
                        token, prob = _sample(logits, xs, settings)
                    tok_buf = jnp.roll(tok_buf, -1, axis=1).at[:, -1].set(
                        token.astype(tok_buf.dtype))
                    pos_buf = jnp.roll(pos_buf, -1, axis=1).at[:, -1].set(
                        pos_next.astype(jnp.float32))
                    logp = logp + jnp.log(jnp.maximum(prob, 1e-38))
                    return (tok_buf, pos_buf, pos_next + 1, logp), token

                keys = (jnp.arange(num_steps) if row_mode
                        else jax.random.split(rng, num_steps))
                n = arrays["tok_buf"].shape[0]
                carry = (arrays["tok_buf"], arrays["pos_buf"],
                         arrays["pos_next"], jnp.zeros(n))
                (tok_buf, pos_buf, pos_next, logp), tokens = jax.lax.scan(
                    body, carry, keys)
                new_arrays = dict(arrays, tok_buf=tok_buf, pos_buf=pos_buf,
                                  pos_next=pos_next)
                return new_arrays, tokens.T, logp
            return fn

        key = ("win_seg", num_steps, settings, arrays["tok_buf"].shape,
               rng.shape)
        return self._jitted(key, build)(params, arrays, rng)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def _grow_cache(self, arrays, new_len):
        def pad(c):
            # slot axis is last for both caches (N,H,dh,S) and scales
            cur = c.shape[-1]
            return jnp.pad(
                c, [(0, 0)] * (c.ndim - 1) + [(0, new_len - cur)])
        caches = [{key: pad(value) for key, value in c.items()}
                  for c in arrays["caches"]]
        return dict(arrays, caches=caches)

    def init_state(self, params, init_tokens, num_new_tokens, x_enc=None,
                   sliding_window=None):
        init_len = init_tokens.shape[1]
        if self.model.cfg.use_pos_cond:
            if sliding_window is None:
                raise ValueError("use_pos_cond model needs sliding_window")
            if init_len >= sliding_window:
                raise ValueError(
                    "conditioning grid must be shorter than the sliding "
                    f"window (init_len={init_len} >= {sliding_window})")
            # cached while context < window; cache sized for the pre-slide
            # phase only.
            total = min(init_len + num_new_tokens, sliding_window)
            first = _bucket_schedule(init_len, total)
            arrays = self._cached_init(params, init_tokens, first,
                                       x_enc, ctx_size=sliding_window)
            return DecodeState(mode="cached", arrays=arrays,
                               init_len=init_len, window=sliding_window,
                               cache_len=first, total_len=total)
        total = init_len + num_new_tokens
        first = _bucket_schedule(init_len, total)
        arrays = self._cached_init(params, init_tokens, first, x_enc,
                                   ctx_size=0)
        return DecodeState(mode="cached", arrays=arrays, init_len=init_len,
                           cache_len=first, total_len=total)

    def _cached_run(self, params, state: DecodeState, rng, num_steps,
                    settings):
        """Cached-mode steps with bucketed cache growth: each sub-segment
        runs at the smallest capacity that holds its tokens."""
        parts, logps = [], []
        remaining = num_steps
        row_mode = _is_row_keys(rng)
        while remaining > 0:
            used = state.init_len + state.gen_count
            capacity = state.cache_len - used
            if capacity <= 0:
                new_len = _bucket_schedule(used + 1, state.total_len)
                state.arrays = self._grow_cache(state.arrays, new_len)
                state.cache_len = new_len
                capacity = state.cache_len - used
            k = min(remaining, capacity)
            if row_mode:
                # per-row keys pass through unchanged: the fold on the
                # global slot index disambiguates steps, so draws are
                # independent of segment boundaries (and of co-batch rows)
                seg_rng = rng
            else:
                rng, seg_rng = jax.random.split(rng)
            arrays, tokens, logp = self._cached_segment(
                params, state.arrays, seg_rng, k, settings)
            state.arrays = arrays
            state.gen_count += k
            remaining -= k
            parts.append(tokens)
            logps.append(logp)
        tokens = parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                  axis=1)
        return tokens, sum(logps[1:], logps[0])

    def segment(self, params, state: DecodeState, rng, num_steps, settings):
        """Generate ``num_steps`` tokens from ``state`` (mutating the Python
        wrapper); returns (tokens (N, steps), logp (N,))."""
        if state.window is None:
            return self._cached_run(params, state, rng, num_steps, settings)

        # hybrid: cached until the context reaches the window size
        n_cached_left = max(
            0, (state.window - state.init_len) - state.gen_count)
        parts, logps = [], []
        row_mode = _is_row_keys(rng)
        if state.mode == "cached":
            k = min(num_steps, n_cached_left)
            if k > 0:
                if row_mode:
                    seg_rng = rng
                else:
                    rng, seg_rng = jax.random.split(rng)
                tokens, logp = self._cached_run(params, state, seg_rng, k,
                                                settings)
                parts.append(tokens)
                logps.append(logp)
            if state.gen_count >= state.window - state.init_len \
                    and num_steps > k:
                state.arrays = self._windowed_from_cached(
                    state.arrays, state.window, state.init_len,
                    state.gen_count, pos_offset=settings.pos_offset)
                state.mode = "windowed"
            num_steps -= k
        if num_steps > 0:
            arrays, tokens, logp = self._windowed_segment(
                params, state.arrays, rng, num_steps, settings)
            state.arrays = arrays
            state.gen_count += num_steps
            parts.append(tokens)
            logps.append(logp)
        tokens = parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                  axis=1)
        logp = logps[0] if len(logps) == 1 else sum(logps)
        return tokens, logp

    def generate(self, params, init_tokens, num_new_tokens, rng, settings,
                 x_enc=None, sliding_window=None):
        """Single-path generation (training-preview decode).

        ``rng`` is either one PRNG key (batch-keyed sampling, historical
        CLI semantics) or a (N, 2) stack of PER-ROW keys — each row's draws
        then depend only on its own key and the token's global slot index,
        so results are invariant to batch composition (serving)."""
        state = self.init_state(params, init_tokens, num_new_tokens,
                                x_enc=x_enc, sliding_window=sliding_window)
        tokens, _ = self.segment(params, state, rng, num_new_tokens, settings)
        return tokens

    def rollout_generate(self, params, init_tokens, num_new_tokens, rng,
                         settings, num_beam, beam_width, x_enc=None,
                         sliding_window=None):
        """Best-of-``num_beam`` rollout decode (reference beam search,
        ``generate_images.py:256-337``), vectorized over a beam batch axis.

        ``rng``: one key — every row draws from one categorical per step
        (batch-keyed, historical CLI semantics) — or PER-ROW keys (N, 2):
        rollout ``b`` of row ``n`` then samples with
        ``fold_in(fold_in(row_key[n], b), global_slot)``, making each row's
        trajectory a pure function of its own key (composition-invariant
        serving sampling; the same request returns the same tokens solo and
        coalesced).

        Returns (N, num_new_tokens) context-representation tokens.
        """
        if num_new_tokens % beam_width != 0:
            raise ValueError("Invalid value for beam_width!")
        n = init_tokens.shape[0]
        row_mode = _is_row_keys(rng)

        state = self.init_state(params, init_tokens, num_new_tokens,
                                x_enc=x_enc, sliding_window=sliding_window)
        if self.quantized_prefix:
            state.arrays = self._quantize_prefix(state.arrays)
        out = []
        for _ in range(num_new_tokens // beam_width):
            if row_mode:
                seg_rng = rng  # slot fold disambiguates segments
            else:
                rng, seg_rng = jax.random.split(rng)

            # shared-prefix fast path: the whole segment stays in cached
            # mode (prefix K/V shared at N rows; only per-rollout blocks
            # are tiled/selected)
            cached_left = (num_new_tokens if state.window is None else
                           max(0, (state.window - state.init_len)
                               - state.gen_count))
            if state.mode == "cached" and beam_width <= cached_left:
                needed = state.init_len + state.gen_count + beam_width
                if needed > state.cache_len:
                    new_len = _bucket_schedule(needed, state.total_len)
                    state.arrays = self._grow_cache(state.arrays, new_len)
                    state.cache_len = new_len
                state.arrays, tokens = self._rollout_segment(
                    params, state.arrays, seg_rng, beam_width, num_beam,
                    settings,
                    prefix_len=state.init_len + state.gen_count)
                state.gen_count += beam_width
                out.append(tokens)
                continue

            # shared windowed path (crossing + steady sliding segments):
            # the window's shared slots stay at N rows — the legacy path
            # below tiled the whole state and re-ran the full window at
            # N*B rows per step.
            if (not self.legacy_windowed_rollouts
                    and state.window is not None
                    and beam_width < state.window):
                if state.mode == "cached":
                    n_cached = cached_left
                    needed = state.init_len + state.gen_count + n_cached
                    if n_cached > 0 and needed > state.cache_len:
                        new_len = _bucket_schedule(needed, state.total_len)
                        state.arrays = self._grow_cache(state.arrays,
                                                        new_len)
                        state.cache_len = new_len
                    state.arrays, tokens = self._windowed_rollout_segment(
                        params, state.arrays, seg_rng, beam_width, num_beam,
                        settings, n_cached=n_cached, window=state.window,
                        init_len=state.init_len, gen0=state.gen_count,
                        kind="crossing")
                    state.mode = "windowed"
                else:
                    state.arrays, tokens = self._windowed_rollout_segment(
                        params, state.arrays, seg_rng, beam_width, num_beam,
                        settings, n_cached=0, window=state.window,
                        init_len=state.init_len, gen0=state.gen_count,
                        kind="steady")
                state.gen_count += beam_width
                out.append(tokens)
                continue

            # legacy path (windowed phase / crossing segments): tile the
            # full state, decode, gather the winner (int8 prefixes convert
            # back to bf16 once — this path runs at most once per decode)
            if self.quantized_prefix and state.mode == "cached":
                state.arrays = self._dequantize_prefix(state.arrays)
            tiled = DecodeState(mode=state.mode,
                                arrays=_tile(state.arrays, num_beam),
                                init_len=state.init_len,
                                gen_count=state.gen_count,
                                window=state.window,
                                cache_len=state.cache_len,
                                total_len=state.total_len)
            tokens, logp = self.segment(
                params, tiled,
                _expand_row_keys(seg_rng, num_beam) if row_mode else seg_rng,
                beam_width, settings)
            winner = jnp.argmax(logp.reshape(n, num_beam), axis=1)
            state.arrays = _select_beam(tiled.arrays, winner, num_beam)
            state.mode = tiled.mode
            state.gen_count = tiled.gen_count
            state.cache_len = tiled.cache_len
            out.append(_select_beam(tokens, winner, num_beam))
        return jnp.concatenate(out, axis=1)
