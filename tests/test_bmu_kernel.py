"""Fused BMU Pallas kernel vs the XLA fallback (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from qaig_tpu.ops.bmu import fused_bmu, bmu_argmin_xla


def test_fused_bmu_matches_xla(rng):
    m, d, k = 300, 16, 64  # non-tile-multiple M exercises padding
    patches = rng.standard_normal((m, d)).astype(np.float32)
    codes = rng.standard_normal((k, d)).astype(np.float32)

    want = np.asarray(bmu_argmin_xla(jnp.asarray(patches),
                                     jnp.asarray(codes)))
    got = np.asarray(fused_bmu(jnp.asarray(patches), jnp.asarray(codes),
                               interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fused_bmu_exact_tile(rng):
    m, d, k = 512, 8, 32
    patches = rng.standard_normal((m, d)).astype(np.float32)
    codes = rng.standard_normal((k, d)).astype(np.float32)
    want = np.asarray(bmu_argmin_xla(jnp.asarray(patches),
                                     jnp.asarray(codes)))
    got = np.asarray(fused_bmu(jnp.asarray(patches), jnp.asarray(codes),
                               interpret=True))
    np.testing.assert_array_equal(got, want)
