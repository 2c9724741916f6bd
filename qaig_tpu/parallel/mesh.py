"""Device mesh construction.

The reference is single-device (its ``--device`` flag allows only cpu/cuda,
``train_autoencoder.py:30-34``); this framework scales through a
``jax.sharding.Mesh`` with axes ``('data', 'model')`` — growing a third
``pipe`` axis (``('data', 'pipe', 'model')``) under pipeline parallelism:
batch sharded over ``data`` (gradient psum over ICI inserted by XLA),
transformer hidden dims optionally sharded over ``model`` (Megatron-style
TP), decoder layers optionally partitioned over ``pipe`` (GPipe,
``qaig_tpu.parallel.pipeline``).  A 1x1 mesh reduces to the single-chip
case, so every code path is mesh-aware.
"""

import logging as _logging

import numpy as np

import jax
from jax.sharding import Mesh

_log = _logging.getLogger("qaig_tpu")


def make_mesh(n_data=None, n_model=1, n_pipe=1, devices=None):
    """Build a ('data', 'model') mesh — or ('data', 'pipe', 'model') when
    ``n_pipe > 1`` (GPipe-style pipeline parallelism over decoder layers,
    see ``qaig_tpu.parallel.pipeline``).  Defaults to all devices on the
    data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // (n_model * n_pipe)
    use = n_data * n_model * n_pipe
    if use > n:
        raise ValueError(
            f"Mesh {n_data}x{n_pipe}x{n_model} needs {use} devices, "
            f"have {n}.")
    if n_pipe > 1:
        arr = np.asarray(devices[:use]).reshape(n_data, n_pipe, n_model)
        return Mesh(arr, ("data", "pipe", "model"))
    arr = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def make_mesh_for_batch(batch_size, n_model=1, n_pipe=1, devices=None):
    """Mesh whose data axis is the largest divisor of ``batch_size`` that
    fits the available devices — keeps small smoke-test batches valid on
    many-device hosts while using every chip when shapes allow.  Under
    pipeline parallelism callers pass the *microbatch* size (the unit the
    data axis must divide)."""
    if devices is None:
        devices = jax.devices()
    cap = max(len(devices) // (n_model * n_pipe), 1)
    n_data = 1
    for d in range(1, cap + 1):
        if batch_size % d == 0:
            n_data = d
    used = n_data * n_model * n_pipe
    if used < len(devices):
        unit = "microbatch" if n_pipe > 1 else "batch"
        shape = (f"{n_data}x{n_pipe}x{n_model}" if n_pipe > 1
                 else f"{n_data}x{n_model}")
        _log.warning(
            "Mesh %s uses %d of %d devices (%s %d not divisible by "
            "more); %d chips idle — pad the %s to a multiple of %d to "
            "use them all.", shape, used, len(devices), unit, batch_size,
            len(devices) - used, unit, cap)
    return make_mesh(n_data=n_data, n_model=n_model, n_pipe=n_pipe,
                     devices=devices)
