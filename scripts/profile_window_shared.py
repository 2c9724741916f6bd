"""Isolate window_forward_shared cost at crossing-segment shapes (TPU)."""

import time
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from qaig_tpu.models.transformer import Transformer, TransformerConfig


def bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def timed(fn, label, reps=5):
    acc = jnp.zeros((), jnp.float32)
    _ = float(jnp.sum(fn(0)))
    t0 = time.time()
    for i in range(reps):
        acc = acc + jnp.sum(fn(i + 1))
    _ = float(acc)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt * 1000:.2f} ms")
    return dt


def main():
    k = 512
    cfg = TransformerConfig(
        use_encoder=True, use_pos_cond=True, num_enc_layers=5,
        num_dec_layers=7, num_enc_embedding=k, num_dec_embedding=k + 1,
        self_attn_heads=8, cross_attn_heads=8, in_dim=512, out_dim=k + 1,
        hidden_dim=2048, hidden_activation="silu")
    model = Transformer(cfg)
    params = bf16(model.init(jax.random.PRNGKey(0)))

    n, b, s0, t = 256, 4, 248, 8
    nb = n * b
    sh_tok = jnp.zeros((n, s0), jnp.int32)
    blk_tok = jnp.zeros((nb, t), jnp.int32)
    sh_pos = jnp.zeros((n, s0), jnp.float32)
    blk_pos = jnp.zeros((nb, t), jnp.float32)
    x_enc = jnp.zeros((n, 64), jnp.int32)
    enc_out = model.encode(params, x_enc)
    cross_kv = model.make_cross_kv(params, enc_out)

    @jax.jit
    def shared(params, sh_tok, blk_tok, sh_pos, blk_pos, ckv):
        return model.window_forward_shared(
            params, sh_tok, blk_tok, shared_pos_cond=sh_pos,
            block_pos_cond=blk_pos, cross_kv=ckv)

    timed(lambda i: shared(params, sh_tok, blk_tok, sh_pos, blk_pos,
                           cross_kv),
          f"window_forward_shared n={n} s0={s0} t={t} B={b}")

    # oracle comparison: full window at N rows (what legacy pays per rollout
    # is this at N*B rows)
    full_tok = jnp.zeros((n, s0 + t), jnp.int32)
    full_pos = jnp.zeros((n, s0 + t), jnp.float32)

    @jax.jit
    def full_n(params, full_tok, full_pos, ckv):
        return model.window_forward(params, full_tok, pos_cond=full_pos,
                                    cross_kv=ckv, last_only=True)

    timed(lambda i: full_n(params, full_tok, full_pos, cross_kv),
          f"window_forward (N rows) n={n} seq={s0 + t}")

    # the same at half batch to check scaling
    ckv_half = [{k2: v[:128] for k2, v in c.items()} for c in cross_kv]
    timed(lambda i: shared(params, sh_tok[:128], blk_tok[:512],
                           sh_pos[:128], blk_pos[:512], ckv_half),
          "window_forward_shared n=128")


if __name__ == "__main__":
    main()
