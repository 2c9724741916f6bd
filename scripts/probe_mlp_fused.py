"""Fused 2-layer-MLP Pallas kernel vs XLA's two dots (run on TPU).

Decode steps at large row counts are bounded partly by the MLP hidden
activations XLA materializes in HBM between the two matmuls — the packed
QKV l0 output at stage-0 bench shapes is (8192, 6144) bf16 = 100 MB
written+read per layer per step.  A row-tiled Pallas kernel keeps the
hidden in VMEM (weights stationary across the grid: constant index_map
blocks are fetched once), eliminating that round-trip.

Shapes: packed QKV (512 -> 3*2048 -> 3x512, act on first) and FFN
(512 -> 2048 -> 512, act on both) at rollout row counts 1024 (stage 1/2)
and 8192 (stage 0).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")


def silu(x):
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _mlp2_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, out_ref, *,
                 act_last, n_split):
    """One row tile: act(x @ w0 + b0) [@ w1_i + b1_i for each split]."""
    x = x_ref[...]
    h = jax.lax.dot_general(
        x, w0_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = silu(h + b0_ref[...].astype(jnp.float32))
    h = h.astype(x.dtype)
    hid = h.shape[1] // n_split
    for i in range(n_split):
        o = jax.lax.dot_general(
            h[:, i * hid:(i + 1) * hid], w1_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = o + b1_ref[i].astype(jnp.float32)
        if act_last:
            o = silu(o)
        out_ref[i] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act_last", "tile"))
def mlp2_fused(x, w0, b0, w1, b1, act_last=False, tile=512):
    """x (N, D); w0 (D, S*H); b0 (S*H,); w1 (S, H, D2); b1 (S, D2).
    Returns (S, N, D2).  Row-tiled; weights fetched once (constant
    index_map)."""
    n, d = x.shape
    s, hid, d2 = w1.shape
    grid = (n // tile,)
    out = pl.pallas_call(
        functools.partial(_mlp2_kernel, act_last=act_last, n_split=s),
        out_shape=jax.ShapeDtypeStruct((s, n, d2), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            pl.BlockSpec((d, s * hid), lambda i: (0, 0)),
            pl.BlockSpec((1, s * hid), lambda i: (0, 0)),
            pl.BlockSpec((s, hid, d2), lambda i: (0, 0, 0)),
            pl.BlockSpec((s, 1, d2), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((s, tile, d2), lambda i: (0, i, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(x, w0, b0[None], w1, b1[:, None])
    return out


# ---------------------------------------------------------------------------
# probe
# ---------------------------------------------------------------------------


def timed(fn, label, reps=20):
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
    rng = np.random.default_rng(0)
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape) * 0.05,
                                   jnp.bfloat16)
    d, hid = 512, 2048
    for rows, layers in ((8192, 7), (1024, 7)):
        x = mk((rows, d))
        # packed QKV: l0 (D, 3H), l1 (3, H, D)
        qkv = [(mk((d, 3 * hid)), mk((3 * hid,)), mk((3, hid, d)),
                mk((3, d))) for _ in range(layers)]
        # FFN: (D, H), (H, D)
        ffn = [(mk((d, hid)), mk((hid,)), mk((1, hid, d)), mk((1, d)))
               for _ in range(layers)]

        @jax.jit
        def xla_chain(x, qkv, ffn):
            for (w0, b0, w1, b1), (f0, fb0, f1, fb1) in zip(qkv, ffn):
                h = silu(x @ w0 + b0)
                h3 = h.reshape(rows, 3, hid).transpose(1, 0, 2)
                o = jnp.einsum("snh,shd->snd", h3, w1,
                               preferred_element_type=jnp.float32)
                o = (o + b1[:, None]).astype(x.dtype)
                g = silu(x @ f0 + fb0)
                g = silu(g @ f1[0] + fb1[0]).astype(x.dtype)
                x = (o[0] + o[1] + o[2] + g) * 0.25  # keep deps, same dims
            return x

        def fused_chain_of(tile):
            @jax.jit
            def fused_chain(x, qkv, ffn):
                for (w0, b0, w1, b1), (f0, fb0, f1, fb1) in zip(qkv, ffn):
                    o = mlp2_fused(x, w0, b0, w1, b1, act_last=False,
                                   tile=tile)
                    g = mlp2_fused(x, f0, fb0, f1, fb1, act_last=True,
                                   tile=tile)
                    x = (o[0] + o[1] + o[2] + g[0]) * 0.25
                return x
            return fused_chain

        # correctness
        want = xla_chain(x, qkv[:1], ffn[:1])
        got = fused_chain_of(512)(x, qkv[:1], ffn[:1])
        err = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        print(f"rows={rows}: fused vs XLA 1-layer max err {err:.5f}",
              flush=True)

        hbm_mb = layers * (rows * 3 * hid + 2 * rows * hid) * 2 / 1e6
        print(f"rows={rows}: hidden-activation HBM round-trip avoided "
              f"~{hbm_mb:.0f} MB/chain", flush=True)
        timed(lambda i: xla_chain(x * (1 + i), qkv, ffn),
              f"XLA 2-dot chain       rows={rows} x{layers} layers")
        for tile in (512, 1024):
            if tile <= rows:
                timed(lambda i, t=tile: fused_chain_of(t)(x * (1 + i),
                                                          qkv, ffn),
                      f"Pallas fused tile={tile:4d} rows={rows} x{layers} "
                      f"layers")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
