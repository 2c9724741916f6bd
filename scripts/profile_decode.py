"""Decode-step cost attribution experiments (run on TPU)."""

import time
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from qaig_tpu.models.transformer import Transformer, TransformerConfig
from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings


def bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def timed(engine, params, init, steps, settings, x_enc, window, label):
    rng = jax.random.PRNGKey(0)
    out = engine.generate(params, init, steps, rng, settings, x_enc=x_enc,
                          sliding_window=window)
    _ = float(jnp.sum(out))  # warmup+compile
    t0 = time.time()
    reps = 3
    acc = jnp.zeros((), jnp.float32)
    for i in range(reps):
        acc = acc + jnp.sum(engine.generate(
            params, init, steps, jax.random.PRNGKey(i + 1), settings,
            x_enc=x_enc, sliding_window=window))
    _ = float(acc)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt:.3f}s total, {dt / steps * 1000:.3f} ms/step")


def run(batch=128, layers=7, hidden=2048, steps=256, window=256, heads=8,
        use_enc=True, label=""):
    k = 512
    cfg = TransformerConfig(
        use_encoder=use_enc, use_pos_cond=window is not None,
        num_enc_layers=5 if use_enc else 0, num_dec_layers=layers,
        num_enc_embedding=k if use_enc else 1,
        num_dec_embedding=k + 1 if use_enc else 2 * k,
        self_attn_heads=heads, cross_attn_heads=heads if use_enc else 0,
        in_dim=512, out_dim=k + 1, hidden_dim=hidden,
        hidden_activation="silu")
    model = Transformer(cfg)
    params = bf16(model.init(jax.random.PRNGKey(0)))
    engine = DecodeEngine(model)
    settings = SamplerSettings(temperature=1.0, end_token=k,
                               end_mode="mask", index_shift=0)
    init = jnp.full((batch, 1), k, jnp.int32)
    x_enc = (jnp.zeros((batch, 64), jnp.int32) if use_enc else None)
    timed(engine, params, init, steps, settings, x_enc, window, label)


if __name__ == "__main__":
    run(label="baseline b128 l7 h2048 w256")
    run(layers=2, label="layers=2")
    run(hidden=512, label="hidden=512")
    run(batch=32, label="batch=32")
    run(window=None, use_enc=True, label="no window (plain cached)")
    run(use_enc=False, window=None, label="decoder-only no window")
