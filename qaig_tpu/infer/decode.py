"""Autoregressive decode engine.

TPU-native replacement for the reference decode loops
(``train_quantized_transformer.py:610-654`` and ``generate_images.py:
256-337``), which re-run the transformer over the whole context window for
every generated token with no KV cache.  Two engines, selected by the model
config:

* **KV-cached** (``use_pos_cond=False``): prefill + ``lax.scan`` of
  single-token steps against per-layer KV caches — O(Seq) attention per
  token instead of O(Seq^2) full recompute.
* **Windowed** (``use_pos_cond=True``): the reference's sliding-window
  semantics make every cached K/V stale once the window slides (each token's
  *window-relative* sinusoidal position changes), so this engine recomputes
  a fixed-size window per step — but as a static-shape ``lax.scan`` with
  ring-style buffers, precomputed encoder K/V, and the whole loop compiled
  once.

Sampling semantics preserved from the reference:

* temperature softmax + categorical sampling,
* ``end_mode='mask'``: the <end> token's probability is zeroed before
  sampling and the chosen token's *unrenormalized* probability is
  accumulated into the rollout score (``generate_images.py:291-304``),
* ``end_mode='replace_zero'``: sample from the full distribution, then remap
  <end> -> 0 (the training-preview hack, ``train_quantized_transformer.py:
  636``),
* ``index_shift``: base-model context tokens live in the combined
  LR+HR vocabulary, so sampled HR indices are shifted up before being fed
  back (``generate_images.py:306-308``),
* rollout "beam search": ``num_beam`` independent continuations of
  ``beam_width`` tokens each; per batch element the continuation with the
  best probability product wins (``generate_images.py:262-337``).  Here the
  rollouts run as one batched decode (batch axis = N * num_beam).
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplerSettings:
    temperature: float = 1.0
    end_token: int = -1         # vocabulary index of <end> (= hr_K)
    end_mode: str = "mask"      # 'mask' | 'replace_zero' | 'none'
    index_shift: int = 0        # added to sampled tokens before re-feeding


def _sample(logits, rng, s: SamplerSettings):
    """Returns (context_token (N,), chosen_prob (N,))."""
    scaled = logits / s.temperature
    probs = jax.nn.softmax(scaled, axis=-1)
    if s.end_mode == "mask":
        probs = probs.at[:, s.end_token].set(0.0)
        sample_logits = jnp.log(jnp.maximum(probs, 1e-38))
    else:
        sample_logits = scaled
    token = jax.random.categorical(rng, sample_logits, axis=-1)
    chosen = jnp.take_along_axis(probs, token[:, None], axis=-1)[:, 0]
    if s.end_mode == "replace_zero":
        token = jnp.where(token == s.end_token, 0, token)
    token = token + s.index_shift
    return token, chosen


def _tile(tree, reps):
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, reps, axis=0) if hasattr(x, "ndim") and
        x.ndim > 0 else x, tree)


def _select_beam(tree, winner, num_beam):
    """Gather the winning rollout's rows from (N*B, ...) leaves."""
    def pick(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        n = winner.shape[0]
        xr = x.reshape((n, num_beam) + x.shape[1:])
        idx = winner.reshape((n,) + (1,) * (xr.ndim - 1))
        idx = jnp.broadcast_to(idx, (n, 1) + xr.shape[2:])
        return jnp.take_along_axis(xr, idx, axis=1)[:, 0]
    return jax.tree_util.tree_map(pick, tree)


class DecodeEngine:
    def __init__(self, model):
        self.model = model
        self._jit_cache = {}

    def _jitted(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(builder())
        return self._jit_cache[key]

    # ------------------------------------------------------------------
    # KV-cached path (use_pos_cond=False)
    # ------------------------------------------------------------------

    def cached_init(self, params, init_tokens, total_len, x_enc=None):
        """Prefill; returns the decode state."""
        model = self.model

        def build():
            def fn(params, init_tokens, x_enc):
                init_tokens = init_tokens.astype(jnp.int32)
                cross_kv = None
                if model.cfg.use_encoder:
                    enc_out = model.encode(params, x_enc)
                    cross_kv = model.make_cross_kv(params, enc_out)
                caches = model.init_cache(init_tokens.shape[0], total_len)
                logits, caches = model.prefill(params, init_tokens, caches,
                                               cross_kv=cross_kv)
                return {"caches": caches, "cross_kv": cross_kv,
                        "logits": logits,
                        "index": jnp.asarray(init_tokens.shape[1], jnp.int32)}
            return fn

        key = ("cached_init", init_tokens.shape, total_len,
               None if x_enc is None else x_enc.shape)
        return self._jitted(key, build)(params, init_tokens, x_enc)

    def cached_segment(self, params, state, rng, num_steps,
                       settings: SamplerSettings):
        """Generate ``num_steps`` tokens; returns (state, tokens (N, steps),
        logp (N,))."""
        model = self.model

        def build():
            def fn(params, state, rng):
                def body(carry, step_rng):
                    logits, caches, index, logp = carry
                    token, p = _sample(logits, step_rng, settings)
                    logits, caches = model.decode_step(
                        params, token, caches, index,
                        cross_kv=state["cross_kv"])
                    return ((logits, caches, index + 1,
                             logp + jnp.log(jnp.maximum(p, 1e-38))), token)

                keys = jax.random.split(rng, num_steps)
                carry = (state["logits"], state["caches"], state["index"],
                         jnp.zeros(state["logits"].shape[0]))
                (logits, caches, index, logp), tokens = jax.lax.scan(
                    body, carry, keys)
                new_state = dict(state, caches=caches, logits=logits,
                                 index=index)
                return new_state, tokens.T, logp
            return fn

        key = ("cached_seg", num_steps, settings,
               state["logits"].shape)
        return self._jitted(key, build)(params, state, rng)

    # ------------------------------------------------------------------
    # Windowed path (use_pos_cond=True)
    # ------------------------------------------------------------------

    def windowed_init(self, params, init_tokens, window, x_enc=None):
        """Fixed-size window buffers; valid tokens occupy slots [0, filled).

        ``init_tokens`` is (N, P) with P <= window; their pos indices are 0
        (matching the reference's zero-initialised ``pos_indices``)."""
        model = self.model

        def build():
            def fn(params, init_tokens, x_enc):
                init_tokens = init_tokens.astype(jnp.int32)
                n, p = init_tokens.shape
                cross_kv = None
                if model.cfg.use_encoder:
                    enc_out = model.encode(params, x_enc)
                    cross_kv = model.make_cross_kv(params, enc_out)
                tok_buf = jnp.zeros((n, window), init_tokens.dtype)
                tok_buf = tok_buf.at[:, :p].set(init_tokens)
                pos_buf = jnp.zeros((n, window), jnp.float32)
                return {"tok_buf": tok_buf, "pos_buf": pos_buf,
                        "cross_kv": cross_kv,
                        "filled": jnp.asarray(p, jnp.int32),
                        "gen_count": jnp.asarray(0, jnp.int32)}
            return fn

        key = ("win_init", init_tokens.shape, window,
               None if x_enc is None else x_enc.shape)
        return self._jitted(key, build)(params, init_tokens, x_enc)

    def windowed_segment(self, params, state, rng, num_steps,
                         settings: SamplerSettings):
        model = self.model
        window = state["tok_buf"].shape[1]

        def build():
            def fn(params, state, rng):
                cross_kv = state["cross_kv"]

                def body(carry, step_rng):
                    tok_buf, pos_buf, filled, gen_count, logp = carry
                    logits_all = model.window_forward(
                        params, tok_buf, pos_cond=pos_buf, cross_kv=cross_kv)
                    read = jnp.clip(filled - 1, 0, window - 1)
                    logits = logits_all[:, read]
                    token, prob = _sample(logits, step_rng, settings)

                    new_pos = (gen_count + 1).astype(jnp.float32)
                    n = tok_buf.shape[0]
                    # append (buffer not yet full) vs slide-left-and-append
                    app_tok = jax.vmap(
                        lambda row, t: jax.lax.dynamic_update_slice(
                            row, t[None], (filled,)))(tok_buf, token)
                    app_pos = jax.vmap(
                        lambda row: jax.lax.dynamic_update_slice(
                            row, new_pos[None], (filled,)))(pos_buf)
                    slide_tok = jnp.roll(tok_buf, -1, axis=1).at[:, -1].set(
                        token)
                    slide_pos = jnp.roll(pos_buf, -1, axis=1).at[:, -1].set(
                        new_pos)
                    not_full = filled < window
                    tok_buf = jnp.where(not_full, app_tok, slide_tok)
                    pos_buf = jnp.where(not_full, app_pos, slide_pos)
                    filled = jnp.minimum(filled + 1, window)
                    logp = logp + jnp.log(jnp.maximum(prob, 1e-38))
                    return ((tok_buf, pos_buf, filled, gen_count + 1, logp),
                            token)

                keys = jax.random.split(rng, num_steps)
                n = state["tok_buf"].shape[0]
                carry = (state["tok_buf"], state["pos_buf"], state["filled"],
                         state["gen_count"], jnp.zeros(n))
                (tok_buf, pos_buf, filled, gen_count, logp), tokens = \
                    jax.lax.scan(body, carry, keys)
                new_state = dict(state, tok_buf=tok_buf, pos_buf=pos_buf,
                                 filled=filled, gen_count=gen_count)
                return new_state, tokens.T, logp
            return fn

        key = ("win_seg", num_steps, settings, state["tok_buf"].shape)
        return self._jitted(key, build)(params, state, rng)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def init_state(self, params, init_tokens, num_new_tokens, x_enc=None,
                   sliding_window=None):
        if self.model.cfg.use_pos_cond:
            if sliding_window is None:
                raise ValueError("use_pos_cond model needs sliding_window")
            return self.windowed_init(params, init_tokens, sliding_window,
                                      x_enc=x_enc)
        total = init_tokens.shape[1] + num_new_tokens
        return self.cached_init(params, init_tokens, total, x_enc=x_enc)

    def segment(self, params, state, rng, num_steps, settings):
        if self.model.cfg.use_pos_cond:
            return self.windowed_segment(params, state, rng, num_steps,
                                         settings)
        return self.cached_segment(params, state, rng, num_steps, settings)

    def generate(self, params, init_tokens, num_new_tokens, rng, settings,
                 x_enc=None, sliding_window=None):
        """Single-path generation (training-preview decode)."""
        state = self.init_state(params, init_tokens, num_new_tokens,
                                x_enc=x_enc, sliding_window=sliding_window)
        _, tokens, _ = self.segment(params, state, rng, num_new_tokens,
                                    settings)
        return tokens

    def rollout_generate(self, params, init_tokens, num_new_tokens, rng,
                         settings, num_beam, beam_width, x_enc=None,
                         sliding_window=None):
        """Best-of-``num_beam`` rollout decode (reference beam search,
        ``generate_images.py:256-337``), vectorized over a beam batch axis.

        Returns (N, num_new_tokens) context-representation tokens.
        """
        if num_new_tokens % beam_width != 0:
            raise ValueError("Invalid value for beam_width!")
        n = init_tokens.shape[0]

        state = self.init_state(params, init_tokens, num_new_tokens,
                                x_enc=x_enc, sliding_window=sliding_window)
        out = []
        num_segments = num_new_tokens // beam_width
        for _ in range(num_segments):
            rng, seg_rng = jax.random.split(rng)
            tiled = _tile(state, num_beam)
            new_state, tokens, logp = self.segment(
                params, tiled, seg_rng, beam_width, settings)
            winner = jnp.argmax(logp.reshape(n, num_beam), axis=1)
            state = _select_beam(new_state, winner, num_beam)
            out.append(_select_beam(tokens, winner, num_beam))
        return jnp.concatenate(out, axis=1)
