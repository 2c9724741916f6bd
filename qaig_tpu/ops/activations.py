"""Activation registry.

Parity target: reference ``models/layers.py:74-80`` — only ``silu``, ``tanh``
and ``sigmoid`` are supported; unknown names raise ``KeyError`` just like the
reference's ``ModuleDict`` lookup.
"""

import jax

_ACTIVATIONS = {
    "silu": jax.nn.silu,
    "tanh": jax.numpy.tanh,
    "sigmoid": jax.nn.sigmoid,
}


def get_activation(activation_type):
    """Return the activation function for ``activation_type``."""
    return _ACTIVATIONS[activation_type]
