"""Fused shared-prefix decode-attention kernels vs the XLA einsum path.

On a TPU backend these run the compiled Mosaic kernels; on the CPU CI
backend the kernels auto-select the Pallas interpreter
(``decode_attention._resolve_interpret``) — same math, so the parity
assertions hold either way and the `--flat-decode`/`--int8-kv` engine
routing gets coverage off-chip.  Round 3: the transposed-layout
(N, H, dh, S) kernels — bf16 and int8 with in-kernel dequantization —
match the XLA path at engine shapes; see docs/PERFORMANCE.md for the
shipped-default decision.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _inputs(n=8, b=4, h=8, s=256, dh=64, bw=8, seed=0):
    # bf16 on a TPU backend (engine dtype); f32 on the CPU CI backend —
    # XLA:CPU's dot thunk has no bf16 path, and the interpreter run is
    # about kernel logic (masks, interleave indexing, in-kernel scales),
    # with bf16 numerics covered on-chip.
    dtype = (jnp.bfloat16 if jax.default_backend() in ("tpu", "axon")
             else jnp.float32)
    rng = np.random.default_rng(seed)
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape) * 0.1, dtype)
    return (mk((n * b, 1, h * dh)), mk((n, h, dh, s)), mk((n, h, dh, s)),
            mk((n * b, h, bw, dh)), mk((n * b, h, bw, dh)))


@pytest.mark.parametrize("index0,block_index", [(200, 5), (1, 0), (256, 7)])
def test_fused_t_matches_einsum(index0, block_index):
    from qaig_tpu.ops.attention import shared_prefix_attention
    from qaig_tpu.ops.decode_attention import shared_prefix_attention_fused_t

    q, kt, vt, kb, vb = _inputs()
    want = shared_prefix_attention(q, kt, vt, kb, vb,
                                   jnp.asarray(index0),
                                   jnp.asarray(block_index))
    got = shared_prefix_attention_fused_t(q, kt, vt, kb, vb,
                                          jnp.asarray(index0),
                                          jnp.asarray(block_index))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)


def test_fused_int8_matches_xla_int8():
    """In-kernel dequant == the XLA folded-scales int8 path (same math,
    tolerance covers reduction-order differences only)."""
    from qaig_tpu.ops.attention import shared_prefix_attention
    from qaig_tpu.ops.decode_attention import (
        shared_prefix_attention_fused_int8)
    from qaig_tpu.ops.kv_quant import quantize_kv_t

    q, kt, vt, kb, vb = _inputs()
    k8, ks = quantize_kv_t(kt)
    v8, vs = quantize_kv_t(vt)
    want = shared_prefix_attention(q, k8, v8, kb, vb, jnp.asarray(200),
                                   jnp.asarray(5), k_scale=ks, v_scale=vs)
    got = shared_prefix_attention_fused_int8(q, k8, ks, v8, vs, kb, vb,
                                             jnp.asarray(200),
                                             jnp.asarray(5))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)


@pytest.mark.parametrize("group", [1, 2, 4])
@pytest.mark.parametrize("index0,block_index", [(200, 5), (1, 0), (256, 7)])
def test_fused_flat_matches_einsum(group, index0, block_index):
    """Interleaved (N, dh, S*H) flat kernel == XLA einsum at every group
    size and prefix/block fill level."""
    from qaig_tpu.ops.attention import shared_prefix_attention
    from qaig_tpu.ops.decode_attention import (
        shared_prefix_attention_fused_flat, interleave_t)

    q, kt, vt, kb, vb = _inputs()
    want = shared_prefix_attention(q, kt, vt, kb, vb,
                                   jnp.asarray(index0),
                                   jnp.asarray(block_index))
    got = shared_prefix_attention_fused_flat(
        q, interleave_t(kt), interleave_t(vt), kb, vb,
        jnp.asarray(index0), jnp.asarray(block_index), heads=8, group=group)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)


def test_fused_flat_int8_matches_xla_int8():
    """Flat-kernel in-kernel dequant == the XLA folded-scales int8 path."""
    from qaig_tpu.ops.attention import shared_prefix_attention
    from qaig_tpu.ops.decode_attention import (
        shared_prefix_attention_fused_flat, interleave_t, interleave_scale)
    from qaig_tpu.ops.kv_quant import quantize_kv_t

    q, kt, vt, kb, vb = _inputs()
    k8, ks = quantize_kv_t(kt)
    v8, vs = quantize_kv_t(vt)
    want = shared_prefix_attention(q, k8, v8, kb, vb, jnp.asarray(200),
                                   jnp.asarray(5), k_scale=ks, v_scale=vs)
    got = shared_prefix_attention_fused_flat(
        q, interleave_t(k8), interleave_t(v8), kb, vb, jnp.asarray(200),
        jnp.asarray(5), heads=8, k_scale=interleave_scale(ks),
        v_scale=interleave_scale(vs), group=4)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)


def test_fused_int8_close_to_bf16():
    """Quantization error stays within the documented serving bound."""
    from qaig_tpu.ops.attention import shared_prefix_attention
    from qaig_tpu.ops.decode_attention import (
        shared_prefix_attention_fused_int8)
    from qaig_tpu.ops.kv_quant import quantize_kv_t

    q, kt, vt, kb, vb = _inputs()
    k8, ks = quantize_kv_t(kt)
    v8, vs = quantize_kv_t(vt)
    exact = shared_prefix_attention(q, kt, vt, kb, vb, jnp.asarray(200),
                                    jnp.asarray(5))
    got = shared_prefix_attention_fused_int8(q, k8, ks, v8, vs, kb, vb,
                                             jnp.asarray(200),
                                             jnp.asarray(5))
    err = np.max(np.abs(np.asarray(exact, np.float32)
                        - np.asarray(got, np.float32)))
    assert err < 0.05, err
