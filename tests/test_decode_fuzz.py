"""Seeded decode-engine fuzz: random schedule shapes vs a naive oracle.

The fixed-shape decode tests pin each path once; this suite sweeps the
SCHEDULE space — (init_len, window, steps, batch, encoder, pos_offset,
end_mode, index_shift) drawn from seeded RNG — because the risky logic is
the segment planner (bucketed cache growth, the crossing segment, the
steady-state (W-1) slide), not the per-step math.

Key-schedule independence: at temperature 1e-6 ``_sample``'s categorical
is an argmax regardless of the PRNG key, so the oracle (a literal
reference-semantics re-enactment: full forward over the sliced context
every step, ``train_quantized_transformer.py:610-654``) needs no
replication of the engine's internal key-split order, and the rollout
beam path (``generate_images.py:256-337``) must degenerate to the same
trajectory (identical rollouts, logp ties broken toward beam 0).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # seeded oracle fuzz: slow tier by design
import jax
import jax.numpy as jnp

from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings, _sample
from qaig_tpu.models.transformer import Transformer, TransformerConfig

GREEDY_T = 1e-6  # categorical == argmax: scaled logit gaps dwarf gumbels


def _oracle(model, params, init, steps, settings, x_enc=None, window=None):
    """Full forward over the (possibly window-sliced) context each step."""
    n, p = init.shape
    key = jax.random.PRNGKey(0)  # irrelevant at greedy temperature
    tokens = init
    pos = jnp.broadcast_to(jnp.arange(p, dtype=jnp.float32)[None], (n, p))
    start = 0
    out = []
    for s in range(steps):
        if window is not None and tokens.shape[1] >= window:
            start += 1
            pos = pos[:, 1:]
        ctx = tokens[:, start:]
        logits = model.apply(params, ctx, x_enc=x_enc,
                             pos_cond=pos if window is not None else None)
        token, _ = _sample(logits[:, -1], key, settings)
        out.append(np.asarray(token))
        tokens = jnp.concatenate([tokens, token[:, None]], axis=1)
        pos = jnp.concatenate(
            [pos, jnp.full((n, 1), p + s + settings.pos_offset,
                           jnp.float32)], axis=1)
    return np.stack(out, axis=1)


def _draw_config(rng):
    use_encoder = bool(rng.integers(2))
    sliding = bool(rng.integers(2))
    window = int(rng.integers(4, 10)) if sliding else None
    p = int(rng.integers(1, window - 1)) if sliding else int(rng.integers(1, 5))
    # steps spans pre-crossing, the crossing segment, and steady-state
    steps = int(rng.integers(1, (window * 3) if sliding else 14))
    n = int(rng.integers(1, 4))
    lr_k, hr_k = 6, 10
    shift = int(rng.choice([0, lr_k]))
    settings = SamplerSettings(
        temperature=GREEDY_T, end_token=hr_k,
        end_mode=str(rng.choice(["mask", "replace_zero"])),
        index_shift=shift,
        pos_offset=int(rng.integers(2)) if sliding else 0)
    cfg = TransformerConfig(
        use_encoder=use_encoder, use_pos_cond=sliding, num_enc_layers=1,
        num_dec_layers=2, num_enc_embedding=8,
        num_dec_embedding=lr_k + hr_k + 1, self_attn_heads=2,
        cross_attn_heads=2, in_dim=16, out_dim=hr_k + 1, hidden_dim=32)
    return cfg, settings, n, p, steps, window, lr_k


@pytest.mark.parametrize("seed", range(8))
def test_fuzzed_schedule_matches_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg, settings, n, p, steps, window, lr_k = _draw_config(rng)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    init = jnp.asarray(rng.integers(0, lr_k, (n, p)), jnp.int32)
    x_enc = (jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 3)))
             if cfg.use_encoder else None)

    engine = DecodeEngine(model)
    got = np.asarray(engine.generate(
        params, init, steps, jax.random.PRNGKey(seed + 99), settings,
        x_enc=x_enc, sliding_window=window))
    want = _oracle(model, params, init, steps, settings,
                   x_enc=x_enc, window=window)
    np.testing.assert_array_equal(
        got, want,
        err_msg=f"cfg: n={n} p={p} steps={steps} window={window} "
                f"enc={cfg.use_encoder} settings={settings}")


@pytest.mark.parametrize("seed", range(4))
def test_fuzzed_rollout_degenerates_to_greedy_path(seed):
    """At greedy temperature every rollout draws the same argmax token, so
    the whole shared-prefix/windowed rollout machinery must reproduce the
    single-path trajectory exactly, for any beam segmentation."""
    rng = np.random.default_rng(2000 + seed)
    cfg, settings, n, p, steps, window, lr_k = _draw_config(rng)
    divisors = [d for d in range(1, min(steps, 8) + 1) if steps % d == 0]
    beam_width = int(rng.choice(divisors))
    num_beam = int(rng.integers(2, 4))
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    init = jnp.asarray(rng.integers(0, lr_k, (n, p)), jnp.int32)
    x_enc = (jnp.asarray(rng.integers(0, cfg.num_enc_embedding, (n, 3)))
             if cfg.use_encoder else None)

    engine = DecodeEngine(model)
    got = np.asarray(engine.rollout_generate(
        params, init, steps, jax.random.PRNGKey(seed + 7), settings,
        num_beam=num_beam, beam_width=beam_width, x_enc=x_enc,
        sliding_window=window))
    # _sample already returns context-representation tokens (index_shift
    # applied), which is exactly what rollout_generate returns
    want = _oracle(model, params, init, steps, settings,
                   x_enc=x_enc, window=window)
    np.testing.assert_array_equal(
        got, want,
        err_msg=f"cfg: n={n} p={p} steps={steps} window={window} "
                f"bw={beam_width} nb={num_beam} enc={cfg.use_encoder} "
                f"settings={settings}")
