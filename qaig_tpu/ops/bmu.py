"""Pallas TPU kernel: fused BMU (best-matching-unit) search.

The codebook hot op (reference ``models/Codebook.py:86-94`` =
``torch.cdist`` + ``argmin``) reformulated for the MXU: per tile of patch
rows, compute ``scores = patches @ codes^T`` on the MXU and reduce
``argmin_k (||w_k||^2 - 2 scores)`` in VMEM — the (M, K) distance matrix
never touches HBM (the XLA fallback materializes it).

The codebook (K, D) is small (K <= a few thousand, D = C*pH*pW) and is
broadcast to every grid step in VMEM.  Rows are tiled at 1024 and the int32
index output is shaped (M/128, 128) so both ends satisfy TPU (8, 128) tile
layouts; callers pad M to a tile multiple (padded rows are dropped).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 1024
_LANES = 128


def _bmu_kernel(patches_ref, codes_ref, code_sq_ref, out_ref):
    patches = patches_ref[:]                       # (TM, D)
    codes = codes_ref[:]                           # (K, D)
    scores = jax.lax.dot_general(
        patches, codes,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # (TM, K)
    dist = code_sq_ref[:] - 2.0 * scores           # (TM, K)
    bmu = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    out_ref[:] = bmu.reshape(ROW_TILE // _LANES, _LANES)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bmu(patches, codes, interpret=False):
    """(M, D) patches x (K, D) codes -> (M,) int32 BMU indices."""
    m, d = patches.shape
    k = codes.shape[0]
    m_pad = (m + ROW_TILE - 1) // ROW_TILE * ROW_TILE
    if m_pad != m:
        patches = jnp.pad(patches, ((0, m_pad - m), (0, 0)))

    code_sq = jnp.sum(
        codes.astype(jnp.float32) * codes.astype(jnp.float32), axis=-1)

    rows_per_tile = ROW_TILE // _LANES
    grid = (m_pad // ROW_TILE,)
    out = pl.pallas_call(
        _bmu_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad // _LANES, _LANES), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_tile, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * d,
            bytes_accessed=m_pad * d * 4 + k * d * 4 + m_pad * 4,
            transcendentals=0),
        interpret=interpret,
    )(patches, codes, code_sq)
    return out.reshape(m_pad)[:m]


def bmu_argmin_xla(patches, codes):
    """XLA fallback: same math, (M, K) distance matrix materialized."""
    code_sq = jnp.sum(codes * codes, axis=-1)
    scores = patches @ codes.T
    dist = code_sq[None, :] - 2.0 * scores
    return jnp.argmin(dist, axis=-1)


USE_PALLAS_KERNEL = False


def set_pallas_enabled(value):
    global USE_PALLAS_KERNEL
    USE_PALLAS_KERNEL = value


def bmu_argmin(patches, codes):
    """Dispatch: XLA by default, Pallas kernel opt-in.

    Measured on TPU v5e at reference shapes (K=512, D=16, M=64k rows per
    codebook train step): the XLA path runs the step in 1.9 ms vs 20 ms for
    the kernel — D=16 uses 1/8 of the MXU lanes per program, and XLA's own
    matmul+argmin fusion already keeps the distance matrix out of HBM at
    these sizes.  ``set_pallas_enabled(True)`` re-enables the kernel for
    wide-D codebooks.

    The argmin is integer-valued and carries no gradient (the reference's
    ``torch.argmin`` likewise, ``models/Codebook.py:91-94``); inputs are
    stop-gradiented so autodiff never tries to linearize the kernel.
    """
    if USE_PALLAS_KERNEL and jax.default_backend() == "tpu":
        return fused_bmu(jax.lax.stop_gradient(patches),
                         jax.lax.stop_gradient(codes))
    return bmu_argmin_xla(patches, codes)
