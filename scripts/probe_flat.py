"""Interleaved flattened Pallas decode-attention kernels: A/B on TPU.

Same 8-step-scan protocol as probe_kernel_t, operands passed as jit args
(the engine shape).  Variants: XLA transposed bf16 baseline, flat-Pallas
bf16, flat-Pallas int8 (in-kernel dequant, half the stream).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from qaig_tpu.ops.attention import shared_prefix_attention
from qaig_tpu.ops.decode_attention import (shared_prefix_attention_fused_flat,
                                           interleave_t, interleave_scale)
from qaig_tpu.ops.kv_quant import quantize_kv_t


def timed(fn, label, reps=10):
    acc = jnp.zeros((), jnp.float32)
    _ = float(jnp.sum(fn(0)))
    t0 = time.time()
    for i in range(reps):
        acc = acc + jnp.sum(fn(i + 1))
    _ = float(acc)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt * 1000:.3f} ms", flush=True)
    return dt


def main():
    n, b, h, s, dh, bw, layers, steps = 128, 4, 8, 256, 64, 8, 7, 8
    nb = n * b
    rng = np.random.default_rng(0)
    mk = lambda shape: jnp.asarray(
        rng.standard_normal(shape) * 0.1, jnp.bfloat16)
    q0 = mk((nb, 1, h * dh))
    kst = [mk((n, h, dh, s)) for _ in range(layers)]
    vst = [mk((n, h, dh, s)) for _ in range(layers)]
    kil = [interleave_t(k) for k in kst]
    vil = [interleave_t(v) for v in vst]

    @jax.jit
    def quant_all(kst, vst):
        k8 = [quantize_kv_t(k) for k in kst]
        v8 = [quantize_kv_t(v) for v in vst]
        return ([interleave_t(x[0]) for x in k8],
                [interleave_scale(x[1]) for x in k8],
                [interleave_t(x[0]) for x in v8],
                [interleave_scale(x[1]) for x in v8])

    k8il, k8s, v8il, v8s = quant_all(kst, vst)
    kb, vb = mk((nb, h, bw, dh)), mk((nb, h, bw, dh))
    index0 = jnp.asarray(200)
    block_index = jnp.asarray(5)

    # correctness
    want = shared_prefix_attention(q0, kst[0], vst[0], kb, vb,
                                   index0, block_index)
    got = shared_prefix_attention_fused_flat(q0, kil[0], vil[0], kb, vb,
                                             index0, block_index, heads=h)
    err = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"flat bf16 vs XLA: max abs err {err:.5f}", flush=True)
    got8 = shared_prefix_attention_fused_flat(
        q0, k8il[0], v8il[0], kb, vb, index0, block_index, heads=h,
        k_scale=k8s[0], v_scale=v8s[0])
    err8 = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                                 - got8.astype(jnp.float32))))
    print(f"flat int8 vs XLA bf16: max abs err {err8:.5f}", flush=True)

    def scan_of(layer_fn, n_ops):
        @jax.jit
        def run(q, kb, vb, *caches):
            def body(x, _):
                for l in range(layers):
                    x = layer_fn(x, l, kb, vb, caches)
                return x, None
            x, _ = jax.lax.scan(body, q, None, length=steps)
            return x
        return run

    base = scan_of(lambda x, l, kb, vb, c: shared_prefix_attention(
        x, c[0][l], c[1][l], kb, vb, index0, block_index), 2)

    def flat_of(g):
        return scan_of(
            lambda x, l, kb, vb, c: shared_prefix_attention_fused_flat(
                x, c[0][l], c[1][l], kb, vb, index0, block_index, heads=h,
                group=g), 2)

    def flat8_of(g):
        return scan_of(
            lambda x, l, kb, vb, c: shared_prefix_attention_fused_flat(
                x, c[0][l], c[2][l], kb, vb, index0, block_index, heads=h,
                k_scale=c[1][l], v_scale=c[3][l], group=g), 4)

    logical_mb = layers * 2 * n * h * s * dh * 2 / 1e6
    rows = [("XLA transposed bf16 (args)", base, (kst, vst), logical_mb)]
    for g in (4, 8, 16, 32):
        rows.append((f"Pallas flat bf16 G={g}", flat_of(g),
                     (kil, vil), logical_mb))
        rows.append((f"Pallas flat int8 G={g}", flat8_of(g),
                     (k8il, k8s, v8il, v8s), logical_mb / 2))
    for name, fn, args, mb in rows:
        dt = timed(lambda i: fn(q0 * (1 + i), kb, vb, *args),
                   f"scan x{steps} 7-layer attention [{name}]")
        per = dt / steps
        print(f"    -> {per * 1000:.3f} ms/step, "
              f"{mb / per / 1e3:.0f} GB/s on the K/V stream", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
