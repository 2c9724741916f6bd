"""Probe: does the (N, H, S, dh=64) cache layout pay 128-lane HBM padding?

TPU arrays are tiled (sublane, 128-lane) on the minor two dims; a dh=64
minor dim may be padded to 128 lanes in HBM, doubling the bytes the decode
attention streams per step.  This probe measures (a) raw elementwise-stream
rates for minor-64 vs minor-128 layouts in bf16/int8, and (b) the shipped
``shared_prefix_attention`` vs a K/V-transposed variant where the lane dim
is S (>=128, unpadded).

Chained device-side accumulation protocol (see memory: axon timing quirks).
"""

import math
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

NEG_INF = float("-inf")


def timed(fn, label, reps=20):
    acc = jnp.zeros((), jnp.float32)
    _ = float(jnp.sum(fn(0)))  # compile+warm
    t0 = time.time()
    for i in range(reps):
        acc = acc + jnp.sum(fn(i + 1))
    _ = float(acc)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt * 1000:.3f} ms")
    return dt


def stream_probe():
    """Raw read-rate of the same logical bytes at minor dim 64 vs 128."""
    n, h, s = 128, 8, 256
    elems = n * h * s * 64 * 2  # K and V of one layer, x7 layers below
    for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        a64 = [jnp.ones((n, h, 2 * s, 64), dtype) for _ in range(7)]
        a128 = [jnp.ones((n, h, s, 128), dtype) for _ in range(7)]

        @jax.jit
        def red64(xs, i):
            return sum(jnp.sum(x * (1 + i), dtype=jnp.float32) for x in xs)

        @jax.jit
        def red128(xs, i):
            return sum(jnp.sum(x * (1 + i), dtype=jnp.float32) for x in xs)

        nbytes = 7 * elems * jnp.dtype(dtype).itemsize
        dt = timed(lambda i: red64(a64, jnp.asarray(i, dtype)),
                   f"stream {name} minor-64  ({nbytes / 1e6:.0f} MB logical)")
        print(f"    -> {nbytes / dt / 1e9:.0f} GB/s logical")
        dt = timed(lambda i: red128(a128, jnp.asarray(i, dtype)),
                   f"stream {name} minor-128 ({nbytes / 1e6:.0f} MB logical)")
        print(f"    -> {nbytes / dt / 1e9:.0f} GB/s logical")


def attention_ab():
    from qaig_tpu.ops.attention import shared_prefix_attention, split_heads

    n, b, h, s, dh, bw, layers = 128, 4, 8, 256, 64, 8, 7
    nb = n * b
    d = h * dh
    rng = np.random.default_rng(0)
    mk = lambda shape: jnp.asarray(
        rng.standard_normal(shape) * 0.1, jnp.bfloat16)
    q0 = mk((nb, 1, d))
    ks = [mk((n, h, s, dh)) for _ in range(layers)]
    vs = [mk((n, h, s, dh)) for _ in range(layers)]
    kst = [k.transpose(0, 1, 3, 2) for k in ks]   # (N, H, dh, S)
    vst = [v.transpose(0, 1, 3, 2) for v in vs]
    kb, vb = mk((nb, h, bw, dh)), mk((nb, h, bw, dh))
    index0 = jnp.asarray(200)
    block_index = jnp.asarray(5)

    @jax.jit
    def baseline(q, i, ks, vs, kb, vb):
        x = q * (1 + i)
        for l in range(layers):
            x = shared_prefix_attention(x, ks[l], vs[l], kb, vb,
                                        index0, block_index)
        return x

    def shared_prefix_attention_t(q, k_t, v_t, k_block, v_block,
                                  index0, block_index):
        """K/V stored (N, H, dh, S): lane dim S, no 64-lane padding."""
        nb_, _, d_ = q.shape
        n_, heads, dh_, s_ = k_t.shape
        b_ = nb_ // n_
        bw_ = k_block.shape[2]
        scale = 1.0 / math.sqrt(dh_)

        qh = split_heads(q, heads)                   # (N*B, H, 1, dh)
        qg = qh.reshape(n_, b_, heads, 1, dh_)

        s_shared = jnp.einsum("nbhqd,nhdk->nbhqk", qg, k_t,
                              preferred_element_type=jnp.float32) * scale
        s_shared = s_shared.reshape(nb_, heads, 1, s_)
        valid_shared = (jnp.arange(s_) < index0)[None, None, None, :]
        s_shared = jnp.where(valid_shared, s_shared, NEG_INF)

        s_block = jnp.einsum("nhqd,nhkd->nhqk", qh, k_block,
                             preferred_element_type=jnp.float32) * scale
        valid_block = (jnp.arange(bw_) <= block_index)[None, None, None, :]
        s_block = jnp.where(valid_block, s_block, NEG_INF)

        scores = jnp.concatenate([s_shared, s_block], axis=-1)
        weights = jax.nn.softmax(scores, axis=-1)
        w_shared = weights[..., :s_].reshape(n_, b_, heads, 1, s_)
        w_block = weights[..., s_:]

        out = jnp.einsum("nbhqk,nhdk->nbhqd", w_shared, v_t,
                         preferred_element_type=jnp.float32).reshape(
                             nb_, heads, 1, dh_)
        out = out + jnp.einsum("nhqk,nhkd->nhqd", w_block, v_block,
                               preferred_element_type=jnp.float32)
        from qaig_tpu.ops.attention import merge_heads
        return merge_heads(out).astype(q.dtype)

    @jax.jit
    def transposed(q, i, kst, vst, kb, vb):
        x = q * (1 + i)
        for l in range(layers):
            x = shared_prefix_attention_t(x, kst[l], vst[l], kb, vb,
                                          index0, block_index)
        return x

    # correctness first
    want = baseline(q0, jnp.asarray(0, jnp.bfloat16), ks, vs, kb, vb)
    got = transposed(q0, jnp.asarray(0, jnp.bfloat16), kst, vst, kb, vb)
    err = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"transposed-vs-baseline max abs err: {err:.4f}")

    timed(lambda i: baseline(q0, jnp.asarray(i, jnp.bfloat16),
                             ks, vs, kb, vb),
          "7-layer shared_prefix_attention (N,H,S,dh) baseline")
    timed(lambda i: transposed(q0, jnp.asarray(i, jnp.bfloat16),
                               kst, vst, kb, vb),
          "7-layer shared_prefix_attention (N,H,dh,S) transposed")


if __name__ == "__main__":
    print("devices:", jax.devices())
    if "attn" not in sys.argv:
        stream_probe()
    attention_ab()
