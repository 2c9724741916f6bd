"""Fused shared-prefix decode-attention kernel vs the XLA einsum path.

TPU-only (Pallas TPU kernels don't run on the CPU test backend); the XLA
path remains the shipped default after an honest A/B (docs/PERFORMANCE.md
round-2 negative results).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas TPU kernel needs a TPU backend")


@pytest.mark.parametrize("index0,block_index", [(200, 5), (1, 0), (256, 7)])
def test_fused_matches_einsum(index0, block_index):
    from qaig_tpu.ops.attention import shared_prefix_attention
    from qaig_tpu.ops.decode_attention import shared_prefix_attention_fused

    N, B, H, S, dh, bw = 8, 4, 8, 256, 64, 8
    rng = np.random.default_rng(0)
    mk = lambda shape: jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    q = mk((N * B, 1, H * dh))
    ks, vs = mk((N, H, S, dh)), mk((N, H, S, dh))
    kb, vb = mk((N * B, H, bw, dh)), mk((N * B, H, bw, dh))

    want = shared_prefix_attention(q, ks, vs, kb, vb,
                                   jnp.asarray(index0), jnp.asarray(block_index))
    got = shared_prefix_attention_fused(q, ks, vs, kb, vb,
                                        jnp.asarray(index0),
                                        jnp.asarray(block_index))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=2e-2)
