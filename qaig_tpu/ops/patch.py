"""Patchify / unpatchify with the reference's exact index order.

Parity target: reference ``models/layers.py:8-71`` — patches are enumerated
row-major over the (H/pH, W/pW) grid and each patch is flattened in
(C, pH, pW) order.  Keeping the byte-exact ordering matters because codebook
token indices are positional: a token at sequence position ``s`` always refers
to patch ``(s // nW, s % nW)`` of the latent image.

Layout note: the public contract is NCHW (matching the on-disk ``.npy``
feature-map cache); these are pure reshape/transpose ops that XLA folds into
neighbouring computations, so no separate NHWC variant is needed.
"""


def patchify(image, patch_dim=(4, 4)):
    """(N, C, H, W) -> (N, (H/pH)*(W/pW), C*pH*pW)."""
    patch_h, patch_w = patch_dim
    n, c, h, w = image.shape
    new_h = h // patch_h
    new_w = w // patch_w

    patches = image.reshape(n, c, new_h, patch_h, new_w, patch_w)
    # (N, new_H, new_W, C, pH, pW)
    patches = patches.transpose(0, 2, 4, 1, 3, 5)
    return patches.reshape(n, new_h * new_w, c * patch_h * patch_w)


def unpatchify(patches, image_dim=(32, 32), patch_dim=(4, 4)):
    """(N, Seq, D) -> (N, D/(pH*pW), H, W); exact inverse of :func:`patchify`."""
    image_h, image_w = image_dim
    patch_h, patch_w = patch_dim

    n, _, d = patches.shape
    new_h = image_h // patch_h
    new_w = image_w // patch_w
    c = d // (patch_h * patch_w)

    patches = patches.reshape(n, new_h, new_w, c, patch_h, patch_w)
    # (N, C, new_H, pH, new_W, pW)
    patches = patches.transpose(0, 3, 1, 4, 2, 5)
    return patches.reshape(n, c, patch_h * new_h, patch_w * new_w)
