"""KV-cached decode must agree with the teacher-forcing forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qaig_tpu.models.transformer import Transformer, TransformerConfig


def _small_cfg(**kw):
    base = dict(use_encoder=False, use_pos_cond=False, num_enc_layers=1,
                num_dec_layers=2, num_enc_embedding=8, num_dec_embedding=16,
                self_attn_heads=2, cross_attn_heads=2, in_dim=16, out_dim=12,
                hidden_dim=32)
    base.update(kw)
    return TransformerConfig(**base)


@pytest.mark.parametrize("use_encoder", [False, True])
@pytest.mark.slow
def test_cached_decode_matches_full_forward(rng, use_encoder):
    cfg = _small_cfg(use_encoder=use_encoder)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0))

    n, seq = 2, 9
    tokens = jnp.asarray(rng.integers(0, cfg.num_dec_embedding, (n, seq)))
    x_enc = (jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 4)))
             if use_encoder else None)

    full = model.apply(params, tokens, x_enc=x_enc)  # (N, S, out)

    cross_kv = None
    if use_encoder:
        enc_out = model.encode(params, x_enc)
        cross_kv = model.make_cross_kv(params, enc_out)

    caches = model.init_cache(n, seq)

    # prefill on the first 3 tokens, then step the rest one-by-one
    prefix = 3
    logits, caches = model.prefill(params, tokens[:, :prefix], caches,
                                   cross_kv=cross_kv)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full[:, prefix - 1]), atol=1e-4)

    for i in range(prefix, seq):
        logits, caches = model.decode_step(
            params, tokens[:, i], caches, jnp.asarray(i), cross_kv=cross_kv)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[:, i]), atol=1e-4,
                                   err_msg=f"step {i}")


@pytest.mark.slow
def test_hybrid_sliding_decode_matches_reference_semantics(rng):
    """The hybrid engine (KV-cached until the first slide, then (W-1)-token
    window recompute) must produce the same trajectory as a literal
    re-enactment of the reference decode loop (full forward over the sliced
    context each step, ``train_quantized_transformer.py:610-654``), given
    the same RNG key schedule."""
    import jax
    from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings, _sample

    cfg = _small_cfg(use_encoder=True, use_pos_cond=True, out_dim=17,
                     num_dec_embedding=17)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(3))

    n, window, steps = 2, 6, 12
    end_token = 16
    x_enc = jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 4)))
    init = jnp.full((n, 1), end_token, jnp.int32)  # <start>
    settings = SamplerSettings(temperature=1.0, end_token=end_token,
                               end_mode="replace_zero", index_shift=0)

    root = jax.random.PRNGKey(42)
    engine = DecodeEngine(model)
    got = np.asarray(engine.generate(params, init, steps, root, settings,
                                     x_enc=x_enc, sliding_window=window))

    # replicate the engine's key schedule (segment -> _cached_run -> scan)
    n_cached = window - 1
    r1, seg = jax.random.split(root)
    _, seg2 = jax.random.split(seg)
    keys = list(jax.random.split(seg2, n_cached)) + \
        list(jax.random.split(r1, steps - n_cached))

    # reference-semantics oracle: full forward over the sliced context
    tokens = init
    pos = jnp.zeros((n, 1), jnp.float32)
    start_idx = 0
    out = []
    for s in range(steps):
        if tokens.shape[1] >= window:
            start_idx += 1
            pos = pos[:, 1:]
        win = tokens[:, start_idx:]
        logits = model.apply(params, win, x_enc=x_enc, pos_cond=pos)[:, -1]
        token, _ = _sample(logits, keys[s], settings)
        out.append(np.asarray(token))
        tokens = jnp.concatenate([tokens, token[:, None]], axis=1)
        pos = jnp.concatenate(
            [pos, jnp.full((n, 1), s + 1, jnp.float32)], axis=1)

    want = np.stack(out, axis=1)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("use_pos", [False, True])
@pytest.mark.slow
def test_shared_prefix_rollout_matches_tiled(rng, use_pos):
    """The shared-prefix beam segment must reproduce the legacy
    tile-everything path exactly: same winning tokens, same final logits,
    and the merged shared cache must equal the winner's tiled cache."""
    import jax
    from qaig_tpu.infer.decode import (DecodeEngine, SamplerSettings, _tile,
                                       _select_beam)

    cfg = _small_cfg(use_encoder=True, use_pos_cond=use_pos)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(4))
    engine = DecodeEngine(model)
    settings = SamplerSettings(temperature=1.0, end_token=11,
                               end_mode="mask", index_shift=0)

    n, num_beam, bw = 2, 3, 4
    init = jnp.asarray(rng.integers(0, cfg.num_dec_embedding, (n, 1)))
    x_enc = jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 4)))

    state = engine.init_state(params, init, 12, x_enc=x_enc,
                              sliding_window=16 if use_pos else None)
    seg_rng = jax.random.PRNGKey(11)

    # legacy: tile everything, decode, select
    tiled = _tile(state.arrays, num_beam)
    t_arrays, t_tokens, t_logp = engine._cached_segment(
        params, tiled, seg_rng, bw, settings)
    winner = jnp.argmax(t_logp.reshape(n, num_beam), axis=1)
    want_tokens = _select_beam(t_tokens, winner, num_beam)
    want_logits = _select_beam(t_arrays["logits"], winner, num_beam)
    want_caches = _select_beam(t_arrays["caches"], winner, num_beam)

    # shared-prefix fast path with the same segment rng
    new_arrays, got_tokens = engine._rollout_segment(
        params, state.arrays, seg_rng, bw, num_beam, settings)

    np.testing.assert_array_equal(np.asarray(got_tokens),
                                  np.asarray(want_tokens))
    np.testing.assert_allclose(np.asarray(new_arrays["logits"]),
                               np.asarray(want_logits), atol=1e-4)
    for got_c, want_c in zip(new_arrays["caches"], want_caches):
        for key in ("k", "v"):
            np.testing.assert_allclose(np.asarray(got_c[key]),
                                       np.asarray(want_c[key]), atol=1e-4)


@pytest.mark.slow
def test_remat_matches_no_remat(rng):
    """use_remat (the reference's activation checkpointing) must not change
    outputs or gradients."""
    import jax
    from dataclasses import replace

    cfg = _small_cfg(use_encoder=True, use_pos_cond=True)
    model = Transformer(cfg)
    model_r = Transformer(replace(cfg, use_remat=True))
    params = model.init(jax.random.PRNGKey(2))

    n, seq = 2, 5
    tokens = jnp.asarray(rng.integers(0, cfg.num_dec_embedding, (n, seq)))
    x_enc = jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 3)))
    pos = jnp.asarray(rng.integers(0, 9, (n, seq)))

    def loss(m):
        return lambda p: jnp.sum(
            m.apply(p, tokens, x_enc=x_enc, pos_cond=pos) ** 2)

    out = model.apply(params, tokens, x_enc=x_enc, pos_cond=pos)
    out_r = model_r.apply(params, tokens, x_enc=x_enc, pos_cond=pos)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out), atol=1e-5)

    g = jax.grad(loss(model))(params)
    g_r = jax.grad(loss(model_r))(params)
    for leaf, leaf_r in zip(jax.tree_util.tree_leaves(g),
                            jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(leaf_r), np.asarray(leaf),
                                   atol=1e-4)


@pytest.mark.slow
def test_bucketed_cache_growth_preserves_state(rng, monkeypatch):
    """With a tiny first bucket, generation crosses several cache-growth
    boundaries; the final carry logits must equal the teacher-forcing
    logits over the realized token sequence (cache contents survive every
    pad/regrow)."""
    import jax
    from qaig_tpu.infer import decode as decode_mod
    from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings

    monkeypatch.setattr(decode_mod, "FIRST_BUCKET", 4)

    cfg = _small_cfg(use_encoder=True)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(5))
    engine = DecodeEngine(model)
    settings = SamplerSettings(temperature=1.0, end_token=11,
                               end_mode="none", index_shift=0)

    n, steps = 2, 14
    init = jnp.asarray(rng.integers(0, cfg.num_dec_embedding, (n, 1)))
    x_enc = jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 4)))

    state = engine.init_state(params, init, steps, x_enc=x_enc)
    tokens, _ = engine.segment(params, state, jax.random.PRNGKey(9), steps,
                               settings)
    assert state.cache_len >= state.init_len + steps

    full_seq = jnp.concatenate([init, tokens], axis=1)
    want = model.apply(params, full_seq, x_enc=x_enc)[:, -1]
    got = state.arrays["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_window_forward_matches_apply(rng):
    cfg = _small_cfg(use_encoder=True, use_pos_cond=True)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(1))

    n, seq = 2, 6
    tokens = jnp.asarray(rng.integers(0, cfg.num_dec_embedding, (n, seq)))
    x_enc = jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 4)))
    pos_cond = jnp.asarray(rng.integers(0, 40, (n, seq)))

    want = model.apply(params, tokens, x_enc=x_enc, pos_cond=pos_cond)

    enc_out = model.encode(params, x_enc)
    cross_kv = model.make_cross_kv(params, enc_out)
    got = model.window_forward(params, tokens, pos_cond=pos_cond,
                               cross_kv=cross_kv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    # last_only: exact final-position logits with the trimmed last layer
    got_last = model.window_forward(params, tokens, pos_cond=pos_cond,
                                    cross_kv=cross_kv, last_only=True)
    np.testing.assert_allclose(np.asarray(got_last[:, 0]),
                               np.asarray(want[:, -1]), atol=1e-4)


@pytest.mark.slow
def test_base_mode_multitoken_sliding_decode_matches_oracle(rng):
    """Base-model + sliding-window decode with a multi-token LR conditioning
    grid (reference ``train_quantized_transformer.py:583-620`` base path):
    the prefill must condition slot i with absolute position i (0..P-1), and
    generated tokens continue P, P+1, ...  Trajectory-exact against a
    full-forward re-enactment with the same key schedule."""
    import jax
    from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings, _sample

    lr_k, hr_k = 6, 10
    cfg = _small_cfg(use_encoder=False, use_pos_cond=True,
                     num_dec_embedding=lr_k + hr_k, out_dim=hr_k + 1)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(5))

    n, p, window, steps = 2, 4, 6, 12
    init = jnp.asarray(rng.integers(0, lr_k, (n, p)), jnp.int32)
    settings = SamplerSettings(temperature=1.0, end_token=hr_k,
                               end_mode="replace_zero", index_shift=lr_k)

    root = jax.random.PRNGKey(13)
    engine = DecodeEngine(model)
    got = np.asarray(engine.generate(params, init, steps, root, settings,
                                     sliding_window=window))

    # replicate the engine's key schedule (segment -> _cached_run -> scan)
    n_cached = window - p
    r1, seg = jax.random.split(root)
    _, seg2 = jax.random.split(seg)
    keys = list(jax.random.split(seg2, n_cached)) + \
        list(jax.random.split(r1, steps - n_cached))

    # oracle: full forward over the sliced context, absolute positions
    tokens = init
    pos = jnp.broadcast_to(jnp.arange(p, dtype=jnp.float32)[None], (n, p))
    start_idx = 0
    out = []
    for s in range(steps):
        if tokens.shape[1] >= window:
            start_idx += 1
            pos = pos[:, 1:]
        win = tokens[:, start_idx:]
        logits = model.apply(params, win, pos_cond=pos)[:, -1]
        token, _ = _sample(logits, keys[s], settings)
        out.append(np.asarray(token))
        tokens = jnp.concatenate([tokens, token[:, None]], axis=1)
        pos = jnp.concatenate(
            [pos, jnp.full((n, 1), p + s, jnp.float32)], axis=1)

    want = np.stack(out, axis=1)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_base_mode_multitoken_rollout_generate_runs(rng):
    """Rollout beam decode over a multi-token pos-cond conditioning grid
    (previously raised ValueError) produces valid HR-vocab tokens."""
    import jax
    from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings

    lr_k, hr_k = 6, 10
    cfg = _small_cfg(use_encoder=False, use_pos_cond=True,
                     num_dec_embedding=lr_k + hr_k, out_dim=hr_k + 1)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(6))

    n, p, window, steps = 2, 4, 6, 12
    init = jnp.asarray(rng.integers(0, lr_k, (n, p)), jnp.int32)
    settings = SamplerSettings(temperature=1.0, end_token=hr_k,
                               end_mode="mask", index_shift=lr_k)
    engine = DecodeEngine(model)
    tokens = engine.rollout_generate(
        params, init, steps, jax.random.PRNGKey(2), settings,
        num_beam=2, beam_width=4, sliding_window=window)
    tokens = np.asarray(tokens)
    assert tokens.shape == (n, steps)
    assert tokens.min() >= lr_k and tokens.max() < lr_k + hr_k


@pytest.mark.parametrize("use_encoder,window", [(False, 8), (True, 8),
                                                (True, 9)])
@pytest.mark.slow
def test_shared_windowed_rollout_matches_legacy(rng, monkeypatch,
                                                use_encoder, window):
    """The shared windowed rollout path (window slots at N rows, only the
    per-rollout tail at N*B rows) must reproduce the legacy tile-everything
    path token-for-token at greedy sampling, through the crossing segment
    AND the steady-state sliding segments, with nontrivial beam selection
    (logp accumulates real probabilities).

    window=8: crossing segment has 3 cached + 1 slid step.  window=9:
    the context hits the window exactly at a segment boundary, so the
    crossing segment has ZERO cached steps (part A skipped, part B starts
    at s=0 from the cached-kind state)."""
    from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings

    monkeypatch.setattr(
        jax.random, "categorical",
        lambda key, logits, axis=-1, **kw: jnp.argmax(logits, axis=axis))

    cfg = _small_cfg(use_encoder=use_encoder, use_pos_cond=True)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(7))
    settings = SamplerSettings(temperature=1.0, end_token=11,
                               end_mode="mask", index_shift=0, pos_offset=1)

    n, num_beam, bw, steps = 2, 3, 4, 16
    init = jnp.asarray(rng.integers(0, cfg.num_dec_embedding, (n, 1)))
    x_enc = (jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 4)))
             if use_encoder else None)
    key = jax.random.PRNGKey(3)

    # segment 1 cached fast path, segment 2 crossing (3 cached + 1 slid),
    # segments 3-4 steady-state sliding
    legacy = DecodeEngine(model, legacy_windowed_rollouts=True)
    want = np.asarray(legacy.rollout_generate(
        params, init, steps, key, settings, num_beam=num_beam,
        beam_width=bw, x_enc=x_enc, sliding_window=window))

    shared = DecodeEngine(model)
    got = np.asarray(shared.rollout_generate(
        params, init, steps, key, settings, num_beam=num_beam,
        beam_width=bw, x_enc=x_enc, sliding_window=window))

    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_window_forward_shared_matches_window_forward(rng):
    """window_forward_shared == window_forward(concat window, last_only)
    per rollout, for every tail length."""
    from qaig_tpu.ops.attention import NEG_INF  # noqa: F401 (import check)

    cfg = _small_cfg(use_encoder=True, use_pos_cond=True)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(9))

    n, b, window = 2, 3, 8
    x_enc = jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 4)))
    enc_out = model.encode(params, x_enc)
    cross_kv = model.make_cross_kv(params, enc_out)

    for t in (1, 3, window - 2):
        s0 = (window - 1) - t
        sh_tok = jnp.asarray(
            rng.integers(0, cfg.num_dec_embedding, (n, s0)))
        blk_tok = jnp.asarray(
            rng.integers(0, cfg.num_dec_embedding, (n * b, t)))
        sh_pos = jnp.asarray(rng.integers(0, 20, (n, s0)), jnp.float32)
        blk_pos = jnp.asarray(rng.integers(0, 20, (n * b, t)), jnp.float32)

        got = model.window_forward_shared(
            params, sh_tok, blk_tok, shared_pos_cond=sh_pos,
            block_pos_cond=blk_pos, cross_kv=cross_kv)

        # oracle: per-rollout full window forward
        sh_tok_t = jnp.repeat(sh_tok, b, axis=0)
        sh_pos_t = jnp.repeat(sh_pos, b, axis=0)
        cross_kv_t = [{k: jnp.repeat(v, b, axis=0) for k, v in c.items()}
                      for c in cross_kv]
        full_tok = jnp.concatenate([sh_tok_t, blk_tok], axis=1)
        full_pos = jnp.concatenate([sh_pos_t, blk_pos], axis=1)
        want = model.window_forward(
            params, full_tok, pos_cond=full_pos, cross_kv=cross_kv_t,
            last_only=True)[:, 0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, err_msg=f"tail length {t}")


@pytest.mark.slow
def test_int8_prefix_rollout_matches_exact_closely(rng):
    """quantized_prefix=True produces the same shapes/valid vocab and a
    trajectory that tracks the exact engine closely at greedy sampling
    (int8 per-slot quantization error is ~1e-2 on attention outputs)."""
    import jax
    from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings

    cfg = _small_cfg(use_encoder=True, use_pos_cond=False, out_dim=17,
                     num_dec_embedding=17)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(3))
    n, steps = 2, 16
    x_enc = jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 4)))
    init = jnp.full((n, 1), 16, jnp.int32)
    settings = SamplerSettings(temperature=1.0, end_token=16,
                               end_mode="mask")
    key = jax.random.PRNGKey(9)

    exact = np.asarray(DecodeEngine(model).rollout_generate(
        params, init, steps, key, settings, num_beam=2, beam_width=4,
        x_enc=x_enc))
    q = np.asarray(DecodeEngine(model, quantized_prefix=True)
                   .rollout_generate(params, init, steps, key, settings,
                                     num_beam=2, beam_width=4, x_enc=x_enc))
    assert q.shape == exact.shape
    assert q.min() >= 0 and q.max() < 17
    # same sampling draws + tiny logit perturbation => mostly equal tokens
    agreement = float((q == exact).mean())
    assert agreement >= 0.5, f"agreement {agreement}"


@pytest.mark.slow
def test_int8_prefix_with_sliding_window_crossing(rng):
    """quantized_prefix + sliding window: the crossing segment reads the
    int8 shared caches through the quantization-aware decode_step_shared
    path (no legacy dequantize detour) and hands off to the windowed
    state; output stays shape/vocab-valid and tracks the exact engine."""
    import jax
    from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings

    cfg = _small_cfg(use_encoder=True, use_pos_cond=True, out_dim=17,
                     num_dec_embedding=17)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(3))
    n, steps, window = 2, 16, 8
    x_enc = jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 4)))
    init = jnp.full((n, 1), 16, jnp.int32)
    settings = SamplerSettings(temperature=1.0, end_token=16,
                               end_mode="mask", pos_offset=1)
    key = jax.random.PRNGKey(9)

    exact = np.asarray(DecodeEngine(model).rollout_generate(
        params, init, steps, key, settings, num_beam=2, beam_width=4,
        x_enc=x_enc, sliding_window=window))
    q = np.asarray(DecodeEngine(model, quantized_prefix=True)
                   .rollout_generate(params, init, steps, key, settings,
                                     num_beam=2, beam_width=4, x_enc=x_enc,
                                     sliding_window=window))
    assert q.shape == exact.shape
    assert q.min() >= 0 and q.max() < 17
    agreement = float((q == exact).mean())
    assert agreement >= 0.5, f"agreement {agreement}"


def test_kv_quant_roundtrip_error_bound(rng):
    """Transposed-layout (.., dh, S) quantization: per-SLOT scales (reduce
    over dh), scales dense (.., S)."""
    from qaig_tpu.ops.kv_quant import quantize_kv_t, dequantize_kv_t
    x = jnp.asarray(rng.standard_normal((4, 2, 16, 8)), jnp.float32)
    q, s = quantize_kv_t(x)
    assert q.shape == x.shape and s.shape == (4, 2, 8)
    back = dequantize_kv_t(q, s, jnp.float32)
    amax = np.abs(np.asarray(x)).max(axis=-2, keepdims=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               atol=float(amax.max()) / 127 * 1.01)


def test_flat_segment_supported_predicate():
    """Static shape gate for the interleaved flat Pallas kernel: stage-0
    beam fans (H*B > 64) and non-sublane-aligned block widths (the bw=7
    crossing segment Mosaic can't shape-cast) must fall back."""
    from qaig_tpu.ops.decode_attention import flat_segment_supported

    assert flat_segment_supported(8, 4, 8)        # stage-1/2 rollout
    assert flat_segment_supported(8, 8, 16)
    assert not flat_segment_supported(8, 32, 16)  # stage-0: HB=256
    assert not flat_segment_supported(8, 4, 7)    # crossing n_cached=7
    assert not flat_segment_supported(8, 4, 4)    # bw % 8 != 0
    assert not flat_segment_supported(8, 4, 0)    # no block slots yet


@pytest.mark.slow
def test_flat_decode_engine_falls_back_on_unsupported_shapes(rng):
    """flat_decode=True engine on shapes the kernel does NOT support must
    route every segment through the XLA transposed path (bw=4 is not
    sublane-aligned) — identical program, token-identical output — instead
    of dying in Pallas (which cannot run on the CPU test backend at all,
    so mere completion also proves the fallback took effect)."""
    from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings

    cfg = _small_cfg(use_encoder=True, use_pos_cond=False, out_dim=17,
                     num_dec_embedding=17)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(3))
    n, steps = 2, 16
    x_enc = jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 4)))
    init = jnp.full((n, 1), 16, jnp.int32)
    settings = SamplerSettings(temperature=1.0, end_token=16,
                               end_mode="mask")
    key = jax.random.PRNGKey(9)

    want = np.asarray(DecodeEngine(model).rollout_generate(
        params, init, steps, key, settings, num_beam=2, beam_width=4,
        x_enc=x_enc))
    got = np.asarray(DecodeEngine(model, flat_decode=True).rollout_generate(
        params, init, steps, key, settings, num_beam=2, beam_width=4,
        x_enc=x_enc))
    np.testing.assert_array_equal(got, want)


def test_flat_decode_engine_matches_xla_on_supported_shapes(rng):
    """flat_decode=True on shapes the kernel DOES support (bw=8, H*B<=64)
    routes rollout segments through the interleaved flat Pallas kernel —
    on the CPU CI backend via the Pallas interpreter
    (``decode_attention._resolve_interpret``) — and the trajectory tracks
    the XLA engine (same math, float-tolerance reduction-order drift can
    flip rare near-tie sampling draws)."""
    from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings

    cfg = _small_cfg(use_encoder=True, use_pos_cond=False, out_dim=17,
                     num_dec_embedding=17)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(3))
    n, steps = 2, 16
    x_enc = jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 4)))
    init = jnp.full((n, 1), 16, jnp.int32)
    settings = SamplerSettings(temperature=1.0, end_token=16,
                               end_mode="mask")
    key = jax.random.PRNGKey(9)

    engine = DecodeEngine(model, flat_decode=True)
    assert engine._flat_segment(num_beam=2, block_width=8)  # kernel path on

    want = np.asarray(DecodeEngine(model).rollout_generate(
        params, init, steps, key, settings, num_beam=2, beam_width=8,
        x_enc=x_enc))
    got = np.asarray(engine.rollout_generate(
        params, init, steps, key, settings, num_beam=2, beam_width=8,
        x_enc=x_enc))
    assert got.shape == want.shape
    assert got.min() >= 0 and got.max() < 17
    agreement = float((got == want).mean())
    assert agreement >= 0.9, f"agreement {agreement}"


@pytest.mark.slow
def test_flat_decode_engine_int8_prefix_runs_off_chip(rng):
    """flat_decode + quantized_prefix: the in-kernel-dequant flat variant
    (interleaved int8 caches + per-column scales) executes via the Pallas
    interpreter on CPU and stays shape/vocab-valid, tracking the exact
    engine."""
    from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings

    cfg = _small_cfg(use_encoder=True, use_pos_cond=False, out_dim=17,
                     num_dec_embedding=17)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(3))
    n, steps = 2, 16
    x_enc = jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 4)))
    init = jnp.full((n, 1), 16, jnp.int32)
    settings = SamplerSettings(temperature=1.0, end_token=16,
                               end_mode="mask")
    key = jax.random.PRNGKey(9)

    exact = np.asarray(DecodeEngine(model).rollout_generate(
        params, init, steps, key, settings, num_beam=2, beam_width=8,
        x_enc=x_enc))
    got = np.asarray(
        DecodeEngine(model, quantized_prefix=True, flat_decode=True)
        .rollout_generate(params, init, steps, key, settings, num_beam=2,
                          beam_width=8, x_enc=x_enc))
    assert got.shape == exact.shape
    assert got.min() >= 0 and got.max() < 17
    agreement = float((got == exact).mean())
    assert agreement >= 0.5, f"agreement {agreement}"
