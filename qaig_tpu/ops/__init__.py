from qaig_tpu.ops.patch import patchify, unpatchify
from qaig_tpu.ops.posemb import sinusoidal_pos_emb
from qaig_tpu.ops.activations import get_activation

__all__ = [
    "patchify",
    "unpatchify",
    "sinusoidal_pos_emb",
    "get_activation",
]
