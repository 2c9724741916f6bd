"""Probe: does the (N, H, S, dh=64) cache layout pay 128-lane HBM padding?

TPU arrays are tiled (sublane, 128-lane) on the minor two dims; a dh=64
minor dim may be padded to 128 lanes in HBM, doubling the bytes the decode
attention streams per step.  This probe measures (a) raw elementwise-stream
rates for minor-64 vs minor-128 layouts in bf16/int8, (b) the shipped
``shared_prefix_attention`` vs a K/V-transposed variant where the lane dim
is S (>=128, unpadded), single-dispatch and (c) inside an 8-step scan (the
shape of a real rollout segment, where XLA layout assignment may hoist a
one-time cache transpose out of the loop).

Chained device-side accumulation protocol (see memory: axon timing quirks).
Modes: ``python scripts/probe_layout.py [attn|scan]``.
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


def shared_prefix_attention_t(q, k_t, v_t, k_block, v_block,
                              index0, block_index):
    """``ops.attention.shared_prefix_attention`` with the prefix K/V stored
    (N, H, dh, S): lane dim S, no 64-lane padding."""
    from qaig_tpu.ops.attention import split_heads, merge_heads
    nb, _, d = q.shape
    n, heads, dh, s = k_t.shape
    b = nb // n
    bw = k_block.shape[2]
    scale = 1.0 / math.sqrt(dh)

    qh = split_heads(q, heads)                   # (N*B, H, 1, dh)
    qg = qh.reshape(n, b, heads, 1, dh)

    s_shared = jnp.einsum("nbhqd,nhdk->nbhqk", qg, k_t,
                          preferred_element_type=jnp.float32) * scale
    s_shared = s_shared.reshape(nb, heads, 1, s)
    valid_shared = (jnp.arange(s) < index0)[None, None, None, :]
    s_shared = jnp.where(valid_shared, s_shared, NEG_INF)

    s_block = jnp.einsum("nhqd,nhkd->nhqk", qh, k_block,
                         preferred_element_type=jnp.float32) * scale
    valid_block = (jnp.arange(bw) <= block_index)[None, None, None, :]
    s_block = jnp.where(valid_block, s_block, NEG_INF)

    scores = jnp.concatenate([s_shared, s_block], axis=-1)
    weights = jax.nn.softmax(scores, axis=-1)
    w_shared = weights[..., :s].reshape(n, b, heads, 1, s)
    w_block = weights[..., s:]

    out = jnp.einsum("nbhqk,nhdk->nbhqd", w_shared, v_t,
                     preferred_element_type=jnp.float32).reshape(
                         nb, heads, 1, dh)
    out = out + jnp.einsum("nhqk,nhkd->nhqd", w_block, v_block,
                           preferred_element_type=jnp.float32)
    return merge_heads(out).astype(q.dtype)


def _mk_inputs():
    from qaig_tpu.ops.attention import shared_prefix_attention  # noqa: F401
    n, b, h, s, dh, bw, layers = 128, 4, 8, 256, 64, 8, 7
    rng = np.random.default_rng(0)
    mk = lambda shape: jnp.asarray(
        rng.standard_normal(shape) * 0.1, jnp.bfloat16)
    q0 = mk((n * b, 1, h * dh))
    ks = [mk((n, h, s, dh)) for _ in range(layers)]
    vs = [mk((n, h, s, dh)) for _ in range(layers)]
    kst = [k.transpose(0, 1, 3, 2) for k in ks]   # (N, H, dh, S)
    vst = [v.transpose(0, 1, 3, 2) for v in vs]
    kb, vb = mk((n * b, h, bw, dh)), mk((n * b, h, bw, dh))
    return q0, ks, vs, kst, vst, kb, vb, layers


def stream_probe():
    """Raw read-rate of the same logical bytes at minor dim 64 vs 128."""
    n, h, s = 128, 8, 256
    elems = n * h * s * 64 * 2  # K and V of one layer, x7 layers below
    for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        a64 = [jnp.ones((n, h, 2 * s, 64), dtype) for _ in range(7)]
        a128 = [jnp.ones((n, h, s, 128), dtype) for _ in range(7)]

        @jax.jit
        def red(xs, i):
            return sum(jnp.sum(x * (1 + i), dtype=jnp.float32) for x in xs)

        nbytes = 7 * elems * jnp.dtype(dtype).itemsize
        dt = timed(lambda i: red(a64, jnp.asarray(i, dtype)),
                   f"stream {name} minor-64  ({nbytes / 1e6:.0f} MB logical)")
        print(f"    -> {nbytes / dt / 1e9:.0f} GB/s logical")
        dt = timed(lambda i: red(a128, jnp.asarray(i, dtype)),
                   f"stream {name} minor-128 ({nbytes / 1e6:.0f} MB logical)")
        print(f"    -> {nbytes / dt / 1e9:.0f} GB/s logical")


def attention_ab():
    from qaig_tpu.ops.attention import shared_prefix_attention

    q0, ks, vs, kst, vst, kb, vb, layers = _mk_inputs()
    index0 = jnp.asarray(200)
    block_index = jnp.asarray(5)

    @jax.jit
    def baseline(q, i, ks, vs, kb, vb):
        x = q * (1 + i)
        for l in range(layers):
            x = shared_prefix_attention(x, ks[l], vs[l], kb, vb,
                                        index0, block_index)
        return x

    @jax.jit
    def transposed(q, i, kst, vst, kb, vb):
        x = q * (1 + i)
        for l in range(layers):
            x = shared_prefix_attention_t(x, kst[l], vst[l], kb, vb,
                                          index0, block_index)
        return x

    one = jnp.asarray(0, jnp.bfloat16)
    want = baseline(q0, one, ks, vs, kb, vb)
    got = transposed(q0, one, kst, vst, kb, vb)
    err = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"transposed-vs-baseline max abs err: {err:.4f}")

    timed(lambda i: baseline(q0, jnp.asarray(i, jnp.bfloat16),
                             ks, vs, kb, vb),
          "7-layer shared_prefix_attention (N,H,S,dh) baseline")
    timed(lambda i: transposed(q0, jnp.asarray(i, jnp.bfloat16),
                               kst, vst, kb, vb),
          "7-layer shared_prefix_attention (N,H,dh,S) transposed")


def attention_scan_ab():
    from qaig_tpu.ops.attention import shared_prefix_attention

    q0, ks, vs, kst, vst, kb, vb, layers = _mk_inputs()
    index0 = jnp.asarray(200)
    block_index = jnp.asarray(5)
    steps = 8

    @jax.jit
    def base_scan(q, ks, vs, kb, vb):
        def body(x, _):
            for l in range(layers):
                x = shared_prefix_attention(x, ks[l], vs[l], kb, vb,
                                            index0, block_index)
            return x, None
        x, _ = jax.lax.scan(body, q, None, length=steps)
        return x

    @jax.jit
    def trans_scan(q, kst, vst, kb, vb):
        def body(x, _):
            for l in range(layers):
                x = shared_prefix_attention_t(x, kst[l], vst[l], kb, vb,
                                              index0, block_index)
            return x, None
        x, _ = jax.lax.scan(body, q, None, length=steps)
        return x

    dt = timed(lambda i: base_scan(q0 * (1 + i), ks, vs, kb, vb),
               f"scan x{steps} 7-layer attention, (N,H,S,dh) stored",
               reps=10)
    print(f"    -> {dt / steps * 1000:.3f} ms/step")
    dt = timed(lambda i: trans_scan(q0 * (1 + i), kst, vst, kb, vb),
               f"scan x{steps} 7-layer attention, (N,H,dh,S) stored",
               reps=10)
    print(f"    -> {dt / steps * 1000:.3f} ms/step")


if __name__ == "__main__":
    print("devices:", jax.devices())
    if "scan" in sys.argv:
        attention_scan_ab()
    elif "attn" in sys.argv:
        attention_ab()
    else:
        stream_probe()
        attention_ab()
