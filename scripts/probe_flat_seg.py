"""Segment-level decode-attention A/B at BENCH scale (run on TPU).

The engine pays a per-segment relayout before its 8-step scan: the XLA
path pins dense copies of the sliced caches (`_read_views` `+ 0` barrier),
the flat path interleaves them to (N, dh, S*H).  probe_flat measured only
the in-scan step on pre-laid-out args; this probe times one WHOLE rollout
segment (relayout + 8 steps x 7 layers) for each mode at stage-2 bench
shapes (n=256, b=4), which is what `bench.py --flat-decode --int8-kv`
actually dispatches 24x per image batch.
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
    _ = float(jnp.sum(fn(0)))  # compile + warm
    t0 = time.time()
    for i in range(reps):
        acc = acc + jnp.sum(fn(i + 1))
    _ = float(acc)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt * 1000:.3f} ms", flush=True)
    return dt


def main(n=256):
    b, h, s, dh, bw, layers, steps = 4, 8, 256, 64, 8, 7, 8
    nb = n * b
    rng = np.random.default_rng(0)
    mk = lambda shape: jnp.asarray(
        rng.standard_normal(shape) * 0.1, jnp.bfloat16)
    q0 = mk((nb, 1, h * dh))
    kst = [mk((n, h, dh, s)) for _ in range(layers)]
    vst = [mk((n, h, dh, s)) for _ in range(layers)]

    @jax.jit
    def quant_all(kst, vst):
        k8 = [quantize_kv_t(k) for k in kst]
        v8 = [quantize_kv_t(v) for v in vst]
        return ([x[0] for x in k8], [x[1] for x in k8],
                [x[0] for x in v8], [x[1] for x in v8])

    k8t, k8s_t, v8t, v8s_t = quant_all(kst, vst)
    kb, vb = mk((nb, h, bw, dh)), mk((nb, h, bw, dh))
    index0 = jnp.asarray(200)
    block_index = jnp.asarray(5)

    def seg_xla(quant):
        """Engine default: pin dense copies, then scan XLA attention."""
        @jax.jit
        def run(q, kb, vb, ks, vs, kscale, vscale):
            pin = lambda t: jax.lax.optimization_barrier(
                [x + 0 for x in t])
            ks, vs = pin(ks), pin(vs)
            if quant:
                kscale, vscale = pin(kscale), pin(vscale)

            def body(x, _):
                for l in range(layers):
                    x = shared_prefix_attention(
                        x, ks[l], vs[l], kb, vb, index0, block_index,
                        k_scale=kscale[l] if quant else None,
                        v_scale=vscale[l] if quant else None)
                return x, None
            x, _ = jax.lax.scan(body, q, None, length=steps)
            return x
        return run

    def seg_flat(quant, g):
        """Engine flat path: interleave in-jit, then scan the kernel."""
        @jax.jit
        def run(q, kb, vb, ks, vs, kscale, vscale):
            kil = [interleave_t(x) for x in ks]
            vil = [interleave_t(x) for x in vs]
            ksl = [interleave_scale(x) for x in kscale] if quant else None
            vsl = [interleave_scale(x) for x in vscale] if quant else None

            def body(x, _):
                for l in range(layers):
                    x = shared_prefix_attention_fused_flat(
                        x, kil[l], vil[l], kb, vb, index0, block_index,
                        heads=h, k_scale=ksl[l] if quant else None,
                        v_scale=vsl[l] if quant else None, group=g)
                return x, None
            x, _ = jax.lax.scan(body, q, None, length=steps)
            return x
        return run

    bf16_args = (kb, vb, kst, vst, [jnp.zeros(1)] * layers,
                 [jnp.zeros(1)] * layers)
    int8_args = (kb, vb, k8t, v8t, k8s_t, v8s_t)

    rows = [
        ("XLA bf16 (pin + scan)      ", seg_xla(False), bf16_args),
        ("XLA int8 (pin + scan)      ", seg_xla(True), int8_args),
        ("flat bf16 g8 (il + scan)   ", seg_flat(False, 8), bf16_args),
        ("flat int8 g8 (il + scan)   ", seg_flat(True, 8), int8_args),
        ("flat int8 g4 (il + scan)   ", seg_flat(True, 4), int8_args),
    ]
    for name, fn, args in rows:
        dt = timed(lambda i, f=fn, a=args: f(q0 * (1 + i), *a),
                   f"SEGMENT (relayout + {steps}x{layers} attn) [{name}]")
        print(f"    -> {dt / steps * 1000:.3f} ms/step incl. relayout share",
              flush=True)

    # relayout alone
    @jax.jit
    def il_only(ks, vs):
        return jnp.stack([jnp.sum(interleave_t(k).astype(jnp.float32))
                          + jnp.sum(interleave_t(v).astype(jnp.float32))
                          for k, v in zip(ks, vs)])

    timed(lambda i: il_only([k * (1 + i) for k in kst], vst),
          "interleave_t alone, 7 layers bf16")
    timed(lambda i: il_only([k + i for k in k8t], v8t),
          "interleave_t alone, 7 layers int8")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
