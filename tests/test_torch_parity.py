"""Golden parity of conv/linear primitives against torch (CPU).

These pin the tricky layout/padding conversions: NHWC/HWIO vs torch
NCHW/OIHW, and the transposed-conv padding semantics (k=4, s=2, p=1).
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
F = torch.nn.functional

from qaig_tpu.models import core


def test_conv2d_matches_torch(rng):
    n, cin, cout, h, w = 2, 3, 5, 8, 8
    x = rng.standard_normal((n, cin, h, w)).astype(np.float32)
    tw = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
    tb = rng.standard_normal((cout,)).astype(np.float32)

    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(tw),
                    torch.from_numpy(tb), stride=1, padding=1).numpy()

    params = {"w": jnp.asarray(tw.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
              "b": jnp.asarray(tb)}
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = np.asarray(core.conv2d(params, x_nhwc)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_strided_conv2d_matches_torch(rng):
    n, cin, cout, h, w = 2, 4, 6, 9, 9
    x = rng.standard_normal((n, cin, h, w)).astype(np.float32)
    tw = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
    tb = rng.standard_normal((cout,)).astype(np.float32)

    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(tw),
                    torch.from_numpy(tb), stride=2, padding=1).numpy()

    params = {"w": jnp.asarray(tw.transpose(2, 3, 1, 0)),
              "b": jnp.asarray(tb)}
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = np.asarray(core.conv2d(params, x_nhwc, stride=2)).transpose(
        0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv_transpose2d_matches_torch(rng):
    """torch ConvTranspose2d(k=4, s=2, p=1) == zero-dilated correlation with
    the spatially-flipped kernel; pins the import conversion rule."""
    n, cin, cout, h, w = 2, 4, 3, 5, 7
    x = rng.standard_normal((n, cin, h, w)).astype(np.float32)
    tw = rng.standard_normal((cin, cout, 4, 4)).astype(np.float32)
    tb = rng.standard_normal((cout,)).astype(np.float32)

    want = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(tw),
                              torch.from_numpy(tb), stride=2,
                              padding=1).numpy()
    assert want.shape == (n, cout, 2 * h, 2 * w)

    # (in, out, kh, kw) -> flip spatial -> HWIO
    our_w = tw[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
    params = {"w": jnp.asarray(our_w), "b": jnp.asarray(tb)}
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = np.asarray(core.conv_transpose2d(params, x_nhwc)).transpose(
        0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_linear_and_layernorm_match_torch(rng):
    d_in, d_out = 7, 11
    x = rng.standard_normal((3, d_in)).astype(np.float32)
    tw = rng.standard_normal((d_out, d_in)).astype(np.float32)
    tb = rng.standard_normal((d_out,)).astype(np.float32)

    want = F.linear(torch.from_numpy(x), torch.from_numpy(tw),
                    torch.from_numpy(tb)).numpy()
    got = np.asarray(core.linear({"w": jnp.asarray(tw.T),
                                  "b": jnp.asarray(tb)}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    want_ln = F.layer_norm(torch.from_numpy(x), (d_in,)).numpy()
    got_ln = np.asarray(core.layer_norm(jnp.asarray(x)))
    np.testing.assert_allclose(got_ln, want_ln, atol=1e-5)
