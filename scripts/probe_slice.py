"""Does the engine's in-jit read_len slice-copy rescue the in-scan
cache read, and does the no-op slice (prefix == capacity) regress to the
raw args-passed read?  Same shapes/protocol as probe_flat.

Variants (all XLA einsum, transposed bf16 caches passed as jit args):
  A. scan reads args directly                    (probe_flat baseline)
  B. in-jit slice [..., :200] copy, scan reads the copy (engine, growing)
  C. in-jit slice [..., :256] (no-op), scan reads it (engine, at capacity)
  D. in-jit forced copy (x + 0), scan reads the copy
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from qaig_tpu.ops.attention import shared_prefix_attention


def timed(fn, label, reps=10):
    acc = jnp.zeros((), jnp.float32)
    _ = float(jnp.sum(fn(0)))
    t0 = time.time()
    for i in range(reps):
        acc = acc + jnp.sum(fn(i + 1))
    _ = float(acc)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt * 1000:.3f} ms -> {dt / 8 * 1000:.3f} ms/step",
          flush=True)
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
    kb, vb = mk((nb, h, bw, dh)), mk((nb, h, bw, dh))
    block_index = jnp.asarray(5)

    def scan_of(prep, index0):
        @jax.jit
        def run(q, kb, vb, ks, vs):
            ksr = [prep(k) for k in ks]
            vsr = [prep(v) for v in vs]
            def body(x, _):
                for l in range(layers):
                    x = shared_prefix_attention(
                        x, ksr[l], vsr[l], kb, vb, index0, block_index)
                return x, None
            x, _ = jax.lax.scan(body, q, None, length=steps)
            return x
        return run

    i200 = jnp.asarray(200)
    i256 = jnp.asarray(256)
    for name, fn in (
            ("A args direct, index0=200", scan_of(lambda x: x, i200)),
            ("B slice :200 copy", scan_of(lambda x: x[..., :200], i200)),
            ("C slice :256 no-op", scan_of(lambda x: x[..., :256], i256)),
            ("D forced copy (+0)", scan_of(lambda x: x + 0, i256)),
    ):
        timed(lambda i: fn(q0 * (1 + i), kb, vb, kst, vst), name)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
