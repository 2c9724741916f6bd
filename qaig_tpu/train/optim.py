"""Optimizer factory.

Parity with the reference training loops: Adam with betas (0.5, 0.999)
(``train_autoencoder.py:133-136``) and step-count learning-rate halving —
the reference multiplies lr by 0.5 *after* the update at every
``global_steps % lr_step == 0, > 0`` boundary (``train_autoencoder.py:
228-230``), so update ``c`` (0-based) runs at ``lr0 * 0.5**(max(c-1,0) //
lr_step)``.  Expressed here as an optax schedule so the whole update stays
inside one jitted train step.
"""

import jax.numpy as jnp
import optax


def halving_schedule(base_lr, lr_step):
    def schedule(count):
        halvings = jnp.maximum(count - 1, 0) // lr_step
        return base_lr * (0.5 ** halvings)
    return schedule


def make_adam(base_lr, lr_step=None):
    """Adam(0.5, 0.999) with optional step-halving schedule."""
    if lr_step:
        lr = halving_schedule(base_lr, lr_step)
    else:
        lr = base_lr
    return optax.adam(learning_rate=lr, b1=0.5, b2=0.999, eps=1e-8)


def current_lr(base_lr, lr_step, count):
    """Host-side mirror of the schedule (for log lines)."""
    if not lr_step:
        return base_lr
    return base_lr * (0.5 ** (max(count - 1, 0) // lr_step))
