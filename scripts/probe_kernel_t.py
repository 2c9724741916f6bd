"""Transposed-layout decode-attention variants: correctness + A/B on TPU.

Compares, at bench stage-2 shapes (N=128, B=4, H=8, S=256, dh=64, bw=8),
inside an 8-step scan (one rollout segment's shape):

  1. XLA einsum, transposed bf16 caches      — the shipped path (post-
     migration)
  2. XLA einsum, int8 caches + folded scales — no materialized dequant
  3. Pallas bf16 kernel                      — dense lane tiles
  4. Pallas int8 kernel, in-kernel dequant   — half the HBM stream

Run on TPU: python scripts/probe_kernel_t.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from qaig_tpu.ops.attention import shared_prefix_attention
from qaig_tpu.ops.decode_attention import (shared_prefix_attention_fused_t,
                                           shared_prefix_attention_fused_int8)
from qaig_tpu.ops.kv_quant import quantize_kv_t


def timed(fn, label, reps=10):
    acc = jnp.zeros((), jnp.float32)
    _ = float(jnp.sum(fn(0)))  # compile+warm
    t0 = time.time()
    for i in range(reps):
        acc = acc + jnp.sum(fn(i + 1))
    _ = float(acc)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt * 1000:.3f} ms")
    return dt


def main():
    n, b, h, s, dh, bw, layers, steps = 128, 4, 8, 256, 64, 8, 7, 8
    nb = n * b
    rng = np.random.default_rng(0)
    mk = lambda shape: jnp.asarray(
        rng.standard_normal(shape) * 0.1, jnp.bfloat16)
    q0 = mk((nb, 1, h * dh))
    kst = [mk((n, h, dh, s)) for _ in range(layers)]   # transposed storage
    vst = [mk((n, h, dh, s)) for _ in range(layers)]
    k8 = [quantize_kv_t(k) for k in kst]
    v8 = [quantize_kv_t(v) for v in vst]
    kb, vb = mk((nb, h, bw, dh)), mk((nb, h, bw, dh))
    index0 = jnp.asarray(200)
    block_index = jnp.asarray(5)

    # ---- correctness ----
    want = shared_prefix_attention(q0, kst[0], vst[0], kb, vb,
                                   index0, block_index)
    got = shared_prefix_attention_fused_t(q0, kst[0], vst[0], kb, vb,
                                          index0, block_index)
    err = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"pallas-T bf16 vs XLA: max abs err {err:.5f}")

    got8 = shared_prefix_attention_fused_int8(
        q0, k8[0][0], k8[0][1], v8[0][0], v8[0][1], kb, vb,
        index0, block_index)
    err8 = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                                 - got8.astype(jnp.float32))))
    print(f"pallas-T int8 vs XLA bf16: max abs err {err8:.5f} "
          "(quantization error expected ~0.02)")

    want8 = shared_prefix_attention(
        q0, k8[0][0], v8[0][0], kb, vb, index0, block_index,
        k_scale=k8[0][1], v_scale=v8[0][1])
    errx = float(jnp.max(jnp.abs(want8.astype(jnp.float32)
                                 - got8.astype(jnp.float32))))
    print(f"pallas-T int8 vs XLA int8: max abs err {errx:.5f}")

    # ---- scan A/B ----
    def scan_of(layer_fn):
        @jax.jit
        def run(q, *caches):
            def body(x, _):
                for l in range(layers):
                    x = layer_fn(x, l, caches)
                return x, None
            x, _ = jax.lax.scan(body, q, None, length=steps)
            return x
        return run

    xla_t = scan_of(lambda x, l, c: shared_prefix_attention(
        x, c[0][l], c[1][l], kb, vb, index0, block_index))
    xla_8 = scan_of(lambda x, l, c: shared_prefix_attention(
        x, c[0][l], c[2][l], kb, vb, index0, block_index,
        k_scale=c[1][l], v_scale=c[3][l]))
    pall = scan_of(lambda x, l, c: shared_prefix_attention_fused_t(
        x, c[0][l], c[1][l], kb, vb, index0, block_index))
    pall8 = scan_of(lambda x, l, c: shared_prefix_attention_fused_int8(
        x, c[0][l], c[1][l], c[2][l], c[3][l], kb, vb,
        index0, block_index))

    logical_mb = layers * 2 * n * h * s * dh * 2 / 1e6
    for name, fn, args, mb in (
            ("XLA transposed bf16", xla_t, (kst, vst), logical_mb),
            ("XLA int8 folded-scales", xla_8,
             ([x[0] for x in k8], [x[1] for x in k8],
              [x[0] for x in v8], [x[1] for x in v8]), logical_mb / 2),
            ("Pallas-T bf16", pall, (kst, vst), logical_mb),
            ("Pallas-T int8 in-kernel", pall8,
             ([x[0] for x in k8], [x[1] for x in k8],
              [x[0] for x in v8], [x[1] for x in v8]), logical_mb / 2),
    ):
        dt = timed(lambda i: fn(q0 * (1 + i), *args),
                   f"scan x{steps} 7-layer attention [{name}]")
        per = dt / steps
        print(f"    -> {per * 1000:.3f} ms/step, "
              f"{mb / per / 1e3:.0f} GB/s on the K/V stream")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
