"""Fused decoder-layer megakernel (ops/megastep.py): correctness + A/B.

Oracle = the exact op sequence of Transformer.decode_step_shared's layer
loop (models/transformer.py:277-340).  Shapes = bench stage-2 rollout
decode (N=128, B=4, H=8, S=256, dh=64, bw=8, D=512, hidden=2048, cross
Sc=64), 7 layers, 8-step scan, chained timing.

Run on TPU: python scripts/probe_mega.py [chunk]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from qaig_tpu.models import blocks as B
from qaig_tpu.models import core
from qaig_tpu.models.blocks import BlockConfig
from qaig_tpu.ops.attention import (shared_prefix_attention,
                                    shared_cross_attention, split_heads,
                                    transpose_heads_t)
from qaig_tpu.ops.decode_attention import interleave_t
from qaig_tpu.ops.megastep import (decode_layer_fused, fold_layer_weights,
                                   interleave_cross)


class FakeCfg:
    self_attn_heads = 8
    cross_attn_heads = 8


def bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def oracle_layer(layer, packed, bcfg, x, shared, block, ckv_t, index0,
                 block_index, pos_cond_emb):
    """Replica of decode_step_shared's loop body for one layer.  x is
    (NB, 1, D); returns (out (NB, 1, D), new block)."""
    heads = bcfg.self_attn_heads
    x0 = x
    xn = B.block_norm(layer["self_attn"]["norm"], bcfg, x, pos_cond_emb)
    q, k, v = B.packed_qkv(packed, xn, bcfg.act)
    bk = jax.lax.dynamic_update_slice_in_dim(
        block["k"], split_heads(k, heads), block_index, 2)
    bv = jax.lax.dynamic_update_slice_in_dim(
        block["v"], split_heads(v, heads), block_index, 2)
    attn = shared_prefix_attention(q, shared["k"], shared["v"], bk, bv,
                                   index0, block_index)
    h = B.residual(layer["self_attn"]["res"], attn, x0, pos_cond_emb,
                   bcfg.act)
    if "cross_attn" in layer:
        x0 = h
        xn = B.block_norm(layer["cross_attn"]["norm"], bcfg, h,
                          pos_cond_emb)
        q2 = B.project_q(layer["cross_attn"]["attn"], xn, bcfg.act)
        attn2 = shared_cross_attention(q2, ckv_t["k"], ckv_t["v"])
        h = B.residual(layer["cross_attn"]["res"], attn2, x0,
                       pos_cond_emb, bcfg.act)
    return B.ffn_block(layer["ffn"], bcfg, h, cond=pos_cond_emb), \
        {"k": bk, "v": bv}


def timed(fn, label, reps=10, steps=8):
    acc = jnp.zeros((), jnp.float32)
    _ = float(jnp.sum(fn(0)))
    t0 = time.time()
    for i in range(reps):
        acc = acc + jnp.sum(fn(i + 1))
    _ = float(acc)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt * 1000:.3f} ms -> {dt / steps * 1000:.3f} ms/step",
          flush=True)
    return dt


def main(chunk=16, parts=("attn", "cross", "ffn")):
    n, b, h, s, dh, bw, layers, steps = 128, 4, 8, 256, 64, 8, 7, 8
    d, hidden, sc = 512, 2048, 64
    nb = n * b
    use_pos = True

    bcfg = BlockConfig(in_dim=d, cond_dim=d, cross_cond_dim=d,
                       hidden_dim=hidden, self_attn_heads=h,
                       cross_attn_heads=h, use_cross_attn=True,
                       use_masked_attn=True, use_adaln0=use_pos,
                       use_scale_layer=use_pos, activation_type="silu")
    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, layers)
    layer_params = [bf16(B.init_transformer_block(k, bcfg)) for k in keys]
    packed = [B.pack_qkv(p["self_attn"]["attn"]) for p in layer_params]

    rnp = np.random.default_rng(0)
    mk = lambda shape: jnp.asarray(rnp.standard_normal(shape) * 0.1,
                                   jnp.bfloat16)
    x = mk((nb, 1, d))
    kst = [mk((n, h, dh, s)) for _ in range(layers)]
    vst = [mk((n, h, dh, s)) for _ in range(layers)]
    blocks0 = [{"k": mk((nb, h, bw, dh)), "v": mk((nb, h, bw, dh))}
               for _ in range(layers)]
    ckv_t = [{"k": mk((n, h, dh, sc)), "v": mk((n, h, dh, sc))}
             for _ in range(layers)]
    pos_cond = mk((1, 1, d)) if use_pos else None
    index0 = jnp.asarray(200)
    block_index = jnp.asarray(5)

    kil = [interleave_t(k) for k in kst]
    vil = [interleave_t(v) for v in vst]
    ckil = [interleave_cross(c["k"]) for c in ckv_t]
    cvil = [interleave_cross(c["v"]) for c in ckv_t]
    folded = [fold_layer_weights(p, pk, FakeCfg, pos_cond)
              for p, pk in zip(layer_params, packed)]

    full = set(parts) == {"attn", "cross", "ffn"}
    # ---- correctness: one layer ----
    want, blk_w = oracle_layer(
        layer_params[0], packed[0], bcfg, x,
        {"k": kst[0], "v": vst[0]}, blocks0[0], ckv_t[0],
        index0, block_index, pos_cond)
    w0, use_cross, gated = folded[0]
    got, bk_g, bv_g = decode_layer_fused(
        x[:, 0], kil[0], vil[0], blocks0[0]["k"], blocks0[0]["v"],
        ckil[0], cvil[0], w0, index0, block_index, heads=h, beams=b,
        use_cross=use_cross, gated=gated, chunk=chunk, parts=parts)
    if full:
        err = float(jnp.max(jnp.abs(want[:, 0].astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        errb = float(jnp.max(jnp.abs(
            blk_w["k"].astype(jnp.float32) - bk_g.astype(jnp.float32))))
        print(f"megakernel vs oracle: out err {err:.5f}, "
              f"block-k err {errb:.5f}", flush=True)

    # ---- speed: 7 layers x 8 steps ----
    @jax.jit
    def run_oracle(x, blocks_, caches, ckvs):
        def body(carry, _):
            xx, blks = carry
            new = []
            for l in range(layers):
                xx, nb_ = oracle_layer(
                    layer_params[l], packed[l], bcfg, xx, caches[l],
                    blks[l], ckvs[l], index0, block_index, pos_cond)
                new.append(nb_)
            return (xx, new), None
        (xx, _), _ = jax.lax.scan(body, (x, blocks_), None, length=steps)
        return xx

    @jax.jit
    def run_mega(x, blocks_, kils, vils, ckils, cvils):
        def body(carry, _):
            xx, blks = carry
            new = []
            for l in range(layers):
                w, uc, gt = folded[l]
                xx, bk2, bv2 = decode_layer_fused(
                    xx, kils[l], vils[l], blks[l]["k"], blks[l]["v"],
                    ckils[l], cvils[l], w, index0, block_index, heads=h,
                    beams=b, use_cross=uc, gated=gt, chunk=chunk,
                    parts=parts)
                new.append({"k": bk2, "v": bv2})
            return (xx, new), None
        (xx, _), _ = jax.lax.scan(body, (x[:, 0], blocks_), None,
                                  length=steps)
        return xx

    if full:
        timed(lambda i: run_oracle(
            x * (1 + i), blocks0,
            [{"k": k, "v": v} for k, v in zip(kst, vst)], ckv_t),
            "XLA oracle (decode_step_shared ops), 7 layers")
    timed(lambda i: run_mega(x * (1 + i), blocks0, kil, vil, ckil, cvil),
          f"megakernel, 7 layers, chunk={chunk}, parts={','.join(parts)}")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main(chunk=int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         parts=tuple(sys.argv[2].split(","))
         if len(sys.argv) > 2 else ("attn", "cross", "ffn"))
