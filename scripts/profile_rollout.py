"""Rollout (beams) decode cost attribution at bench shapes (run on TPU).

Times each cascade stage's rollout_generate in isolation and, for stage 2,
splits cached-segment cost from the crossing segment by timing a truncated
run (224 tokens — no slide) vs the full 256.
"""

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


def timed(fn, label, reps=3):
    acc = jnp.zeros((), jnp.float32)
    _ = float(jnp.sum(fn(0)))  # compile+warm
    t0 = time.time()
    for i in range(reps):
        acc = acc + jnp.sum(fn(i + 1))
    _ = float(acc)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt:.4f}s")
    return dt


def stage(batch, steps, num_beam, beam_width, use_enc, enc_len, window,
          label, reps=3, layers=7):
    k = 512
    cfg = TransformerConfig(
        use_encoder=use_enc, use_pos_cond=window is not None,
        num_enc_layers=5 if use_enc else 0, num_dec_layers=layers,
        num_enc_embedding=k if use_enc else 1,
        num_dec_embedding=k + 1 if use_enc else 2 * k,
        self_attn_heads=8, cross_attn_heads=8 if use_enc else 0,
        in_dim=512, out_dim=k + 1, hidden_dim=2048,
        hidden_activation="silu")
    model = Transformer(cfg)
    params = bf16(model.init(jax.random.PRNGKey(0)))
    engine = DecodeEngine(model)
    settings = SamplerSettings(temperature=1.0, end_token=k,
                               end_mode="mask", index_shift=0,
                               pos_offset=1 if window is not None else 0)
    init = jnp.full((batch, 1), k, jnp.int32)
    x_enc = (jnp.zeros((batch, enc_len), jnp.int32) if use_enc else None)

    def fn(i):
        return engine.rollout_generate(
            params, init, steps, jax.random.PRNGKey(i), settings,
            num_beam=num_beam, beam_width=beam_width, x_enc=x_enc,
            sliding_window=window)
    return timed(fn, label, reps)


if __name__ == "__main__":
    b = 256
    stage(b, 16, 32, 16, False, 0, None, "stage0 (16 tok, 32x16, base)")
    stage(b, 16, 8, 16, False, 0, None, "stage0 variant nb=8")
    stage(b, 64, 4, 8, True, 16, None, "stage1 (64 tok, 4x8, enc 16)")
    stage(b, 256, 4, 8, True, 64, 256,
          "stage2 full (256 tok, 4x8, enc 64, w256)")
    stage(b, 224, 4, 8, True, 64, 256,
          "stage2 truncated 224 (cached only)")
    stage(b, 248, 4, 8, True, 64, 256,
          "stage2 truncated 248 (cached only)")
