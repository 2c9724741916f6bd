"""Fused shared-prefix decode attention (Pallas TPU kernels).

The rollout-beam decode hot loop
(``ops/attention.py::shared_prefix_attention``) is HBM-bound: every
generated token streams the whole shared prefix K/V plus the per-rollout
blocks.  These kernels fuse the full attention for one batch element —
prefix scores, block scores, joint masked softmax, and both weighted
sums — into one pass over the K/V tiles, on the TRANSPOSED (N, H, dh, S)
cache layout (dense 128-lane tiles; see
``ops.attention.transpose_heads_t``).

Two variants: bf16, and int8 with IN-KERNEL dequantization — the int8
tiles stream from HBM at half the bytes and the per-slot scales fold into
the f32 score matrix / softmax probabilities, so the dequantized operand
XLA's int8 path would materialize never exists.

Round-2's flattened-heads kernel on the padded (N, H, S, dh) layout is
retired (results preserved in docs/PERFORMANCE.md).

Numerics: scores/softmax in float32 like the einsum path; reduction order
differs from XLA's, so outputs match to float tolerance, not bit-exactly.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _resolve_interpret(interpret):
    """``interpret=None`` (the default) auto-selects the Pallas interpreter
    off-TPU, so the kernels — and the engine modes that route through them
    (``--flat-decode``, ``--int8-kv``) — run under the CPU CI backend with
    the same math (see ``ops/bmu.py`` for the same pattern)."""
    if interpret is None:
        return jax.default_backend() not in ("tpu", "axon")
    return interpret


# ---------------------------------------------------------------------------
# Transposed-layout (lanes = S) kernels — round-3 generation.
#
# The round-2 kernels above stream (.., S, dh=64) tiles whose 64-wide minor
# dim is padded to 128 lanes in VMEM/HBM: every DMA moves ~2x the logical
# bytes, which is where the "Pallas is 40% slower than XLA" plateau came
# from.  Storing the prefix K/V transposed as (N, H, dh, S) puts S (>= 128)
# on the lane axis — tiles are dense, and the score dot takes K^T in its
# MXU-native (contracting, free) layout.  The int8 variant additionally
# dequantizes INSIDE the kernel: int8 tiles stream from HBM (half the
# bytes), the per-slot scales fold into the f32 score matrix and the
# softmax probabilities, and the MXU sees bf16 — the dequantized operand
# XLA would materialize in HBM (qaig_tpu/ops/kv_quant.py) never exists.
# ---------------------------------------------------------------------------


def _head_attention(q_h, kt_h, vt_h, kb_h, vb_h, index0, block_index,
                    scale, k_scale_h=None, v_scale_h=None, upcast=False):
    """One head's shared-prefix + block attention on transposed tiles.

    q_h (B, dh) bf16; kt_h/vt_h (dh, S) bf16 or int8 (+ per-slot scales
    (S,) f32); kb_h/vb_h (B, bw, dh) bf16.  Returns (B, dh) f32.
    ``upcast`` runs the dots in f32 (interpret mode: XLA:CPU's dot thunk
    has no bf16 x bf16 = f32 path; same values, f32 accumulate as on TPU).
    """
    b, dh = q_h.shape
    s = kt_h.shape[1]
    bw = kb_h.shape[1]
    mxu = jnp.float32 if upcast else jnp.bfloat16
    if upcast:
        q_h = q_h.astype(mxu)
        kb_h = kb_h.astype(mxu)
        vb_h = vb_h.astype(mxu)

    k_op = kt_h.astype(mxu) if kt_h.dtype != mxu else kt_h
    sc_s = jax.lax.dot_general(
        q_h, k_op, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (B, S)
    if k_scale_h is not None:
        sc_s = sc_s * k_scale_h[None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    sc_s = jnp.where(col < index0, sc_s, NEG)

    # per-rollout block scores as one (B, B*bw) dot with cross-rollout
    # pairs masked (Mosaic-friendly 2D ops; the waste is 4x32 floats)
    kb2 = kb_h.reshape(b * bw, dh)
    sc_b = jax.lax.dot_general(
        q_h, kb2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (B, B*bw)
    brow = jax.lax.broadcasted_iota(jnp.int32, (b, b * bw), 0)
    bcol = jax.lax.broadcasted_iota(jnp.int32, (b, b * bw), 1)
    valid_b = jnp.logical_and(brow == bcol // bw,
                              (bcol % bw) <= block_index)
    sc_b = jnp.where(valid_b, sc_b, NEG)

    m = jnp.maximum(jnp.max(sc_s, axis=1), jnp.max(sc_b, axis=1))  # (B,)
    p_s = jnp.exp(sc_s - m[:, None])
    p_b = jnp.exp(sc_b - m[:, None])
    denom = jnp.sum(p_s, axis=1) + jnp.sum(p_b, axis=1)

    pv = p_s * v_scale_h[None, :] if v_scale_h is not None else p_s
    v_op = vt_h.astype(mxu) if vt_h.dtype != mxu else vt_h
    o_s = jax.lax.dot_general(
        pv.astype(mxu), v_op, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (B, dh)
    vb2 = vb_h.reshape(b * bw, dh)
    o_b = jax.lax.dot_general(
        p_b.astype(mxu), vb2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (B, dh)
    return (o_s + o_b) / denom[:, None]


def _kernel_t_bf16(idx_ref, q_ref, kt_ref, vt_ref, kb_ref, vb_ref, out_ref,
                   *, scale, upcast=False):
    index0, block_index = idx_ref[0], idx_ref[1]
    h = q_ref.shape[1]
    for i in range(h):
        out = _head_attention(q_ref[0, i], kt_ref[0, i], vt_ref[0, i],
                              kb_ref[0, i], vb_ref[0, i], index0,
                              block_index, scale, upcast=upcast)
        out_ref[0, i] = out.astype(out_ref.dtype)


def _kernel_t_int8(idx_ref, q_ref, kt_ref, ks_ref, vt_ref, vs_ref, kb_ref,
                   vb_ref, out_ref, *, scale, upcast=False):
    index0, block_index = idx_ref[0], idx_ref[1]
    h = q_ref.shape[1]
    for i in range(h):
        out = _head_attention(q_ref[0, i], kt_ref[0, i], vt_ref[0, i],
                              kb_ref[0, i], vb_ref[0, i], index0,
                              block_index, scale,
                              k_scale_h=ks_ref[0, i].astype(jnp.float32),
                              v_scale_h=vs_ref[0, i].astype(jnp.float32),
                              upcast=upcast)
        out_ref[0, i] = out.astype(out_ref.dtype)


def _prep_qb(q, k_block, v_block, n):
    nb, _, d = q.shape
    b = nb // n
    bw = k_block.shape[2]
    h = k_block.shape[1]
    dh = d // h
    q4 = q.reshape(n, b, h, dh).transpose(0, 2, 1, 3)        # (N,H,B,dh)
    kb = k_block.reshape(n, b, h, bw, dh).transpose(0, 2, 1, 3, 4)
    vb = v_block.reshape(n, b, h, bw, dh).transpose(0, 2, 1, 3, 4)
    return q4, kb, vb, b, bw, h, dh


@functools.partial(jax.jit, static_argnames=("interpret",))
def shared_prefix_attention_fused_t(q, kt_shared, vt_shared, k_block,
                                    v_block, index0, block_index,
                                    interpret=None):
    """Fused shared-prefix rollout attention over TRANSPOSED (N, H, dh, S)
    prefix caches (dense lane tiles).  Drop-in output-compatible with
    ``attention.shared_prefix_attention``; q/k_block/v_block keep their
    engine shapes ((N*B, 1, D) / (N*B, H, bw, dh)).  ``interpret=None``
    auto-selects the Pallas interpreter off-TPU (CPU CI, same math)."""
    interpret = _resolve_interpret(interpret)
    n, h, dh, s = kt_shared.shape
    q4, kb, vb, b, bw, _, _ = _prep_qb(q, k_block, v_block, n)
    scale = 1.0 / math.sqrt(dh)
    idx = jnp.stack([jnp.asarray(index0, jnp.int32),
                     jnp.asarray(block_index, jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, b, dh), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, dh, s), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, dh, s), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, b, bw, dh), lambda i, idx: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, h, b, bw, dh), lambda i, idx: (i, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, b, dh), lambda i, idx: (i, 0, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_t_bf16, scale=scale, upcast=interpret),
        out_shape=jax.ShapeDtypeStruct((n, h, b, dh), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, q4, kt_shared, vt_shared, kb, vb)
    return out.transpose(0, 2, 1, 3).reshape(q.shape[0], 1, q.shape[2])


# ---------------------------------------------------------------------------
# Interleaved flattened kernels: cache stored (N, dh, S*H), column
# c = slot*H + head.  All heads' prefix scores come from ONE MXU dot per
# (element, layer) — (H*B, dh) x (dh, S*H) — cross-head pairs masked in the
# f32 score matrix (the 1/H-useful waste is VPU-cheap; the per-head loop
# above is latency-bound instead).  Slot windows stay CONTIGUOUS column
# ranges (read_len slices, per-segment merges, per-step writes), so the
# layout is engine-compatible.
# ---------------------------------------------------------------------------


def _kernel_flat(idx_ref, q_ref, kil_ref, vil_ref, kb_ref, vb_ref,
                 out_ref, ms_ref, mb_ref, *, ks_ref=None, vs_ref=None,
                 upcast=False):
    """``G`` batch elements per grid program (G = block's leading dim;
    grouping amortizes per-program overhead — the G=1 kernel spends most
    of its time in program dispatch, not DMA).  q (G,H,B,dh) PRE-SCALED
    by 1/sqrt(dh); interleaved prefix K/V (G, dh, S*H) bf16 or int8
    [+ scales (G, 1, S*H)]; blocks (G,H,B,bw,dh) -> out (G,H,B,dh).

    The additive masks ms (HB, S*H) / mb (HB, HB*bw) (0 valid / -1e30
    invalid) are built ONCE by the first grid program into VMEM scratch
    that persists across the sequential TPU grid — the per-program
    iota/mod/compare build was ~40% of the kernel's VPU work (which, not
    DMA, bounds the grouped kernel), and passing masks as inputs instead
    costs a 256 KB DMA per program."""
    index0 = idx_ref[0]
    block_index = idx_ref[1]
    g, h, b, dh = q_ref.shape
    sh = kil_ref.shape[2]
    bw = kb_ref.shape[3]
    hb = h * b

    @pl.when(pl.program_id(0) == 0)
    def _build_masks():
        row = jax.lax.broadcasted_iota(jnp.int32, (hb, sh), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (hb, sh), 1)
        valid_s = jnp.logical_and(row // b == col % h, col // h < index0)
        ms_ref[...] = jnp.where(valid_s, 0.0, NEG).astype(jnp.float32)
        r2 = jax.lax.broadcasted_iota(jnp.int32, (hb, hb * bw), 0)
        c2 = jax.lax.broadcasted_iota(jnp.int32, (hb, hb * bw), 1)
        valid_b = jnp.logical_and(r2 == c2 // bw,
                                  (c2 % bw) <= block_index)
        mb_ref[...] = jnp.where(valid_b, 0.0, NEG).astype(jnp.float32)

    mask_s = ms_ref[...]
    mask_b = mb_ref[...]
    mxu = jnp.float32 if upcast else jnp.bfloat16

    for gi in range(g):
        q2 = q_ref[gi].reshape(hb, dh)              # row r = head*B + b
        if upcast:
            q2 = q2.astype(mxu)

        kil = kil_ref[gi]
        k_op = kil.astype(mxu) if kil.dtype != mxu else kil
        sc_s = jax.lax.dot_general(
            q2, k_op, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (HB, S*H)
        if ks_ref is not None:
            sc_s = sc_s * ks_ref[gi].reshape(1, sh).astype(jnp.float32)
        sc_s = sc_s + mask_s

        kb2 = kb_ref[gi].reshape(hb * bw, dh).astype(mxu)  # c2=(h2*B+b2)*bw+t
        sc_b = jax.lax.dot_general(
            q2, kb2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + mask_b     # (HB, HB*bw)

        m = jnp.maximum(jnp.max(sc_s, axis=1), jnp.max(sc_b, axis=1))
        p_s = jnp.exp(sc_s - m[:, None])
        p_b = jnp.exp(sc_b - m[:, None])
        denom = jnp.sum(p_s, axis=1) + jnp.sum(p_b, axis=1)

        if vs_ref is not None:
            p_s = p_s * vs_ref[gi].reshape(1, sh).astype(jnp.float32)
        vil = vil_ref[gi]
        v_op = vil.astype(mxu) if vil.dtype != mxu else vil
        o_s = jax.lax.dot_general(
            p_s.astype(mxu), v_op, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (HB, dh)
        vb2 = vb_ref[gi].reshape(hb * bw, dh).astype(mxu)
        o_b = jax.lax.dot_general(
            p_b.astype(mxu), vb2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = (o_s + o_b) / denom[:, None]
        out_ref[gi] = out.reshape(h, b, dh).astype(out_ref.dtype)


def _kernel_flat_bf16(idx_ref, q_ref, kil_ref, vil_ref, kb_ref, vb_ref,
                      out_ref, ms_ref, mb_ref, *, upcast=False):
    _kernel_flat(idx_ref, q_ref, kil_ref, vil_ref, kb_ref, vb_ref,
                 out_ref, ms_ref, mb_ref, upcast=upcast)


def _kernel_flat_int8(idx_ref, q_ref, kil_ref, ks_ref, vil_ref, vs_ref,
                      kb_ref, vb_ref, out_ref, ms_ref, mb_ref, *,
                      upcast=False):
    _kernel_flat(idx_ref, q_ref, kil_ref, vil_ref, kb_ref, vb_ref,
                 out_ref, ms_ref, mb_ref, ks_ref=ks_ref, vs_ref=vs_ref,
                 upcast=upcast)


def flat_segment_supported(heads, num_beam, block_width):
    """Whether the interleaved flat kernel handles a rollout segment's
    STATIC shapes well (the engine falls back to the XLA transposed path
    otherwise — correctness is identical either way).

    * ``heads * num_beam`` is the kernel's row count; its masked block-score
      matrix is (HB, HB*bw) with 1/HB useful — the VPU waste and the f32
      intermediates' VMEM both scale with HB.  Stage-0 beam fans (32 beams
      -> HB=256) blew the scoped-VMEM budget at bench scale; the XLA einsum
      is the right tool there.
    * ``block_width`` must be sublane-aligned: the kernel folds the block
      cache (H, B, bw, dh) -> (HB*bw, dh), a Mosaic shape cast that is only
      supported when bw is a multiple of 8 (a bw=7 crossing segment fails
      to compile: "infer-vector-layout: unsupported shape cast").
    """
    return (heads * num_beam <= 64
            and block_width > 0
            and block_width % 8 == 0)


def interleave_t(x_t):
    """(N, H, dh, S) -> interleaved (N, dh, S*H), column = slot*H + head."""
    n, h, dh, s = x_t.shape
    return x_t.transpose(0, 2, 3, 1).reshape(n, dh, s * h)


def interleave_scale(scale_t):
    """(N, H, S) per-slot scales -> (N, S*H)."""
    n, h, s = scale_t.shape
    return scale_t.transpose(0, 2, 1).reshape(n, s * h)


@functools.partial(jax.jit, static_argnames=("heads", "group", "interpret"))
def shared_prefix_attention_fused_flat(q, k_il, v_il, k_block, v_block,
                                       index0, block_index, heads,
                                       k_scale=None, v_scale=None,
                                       group=None, interpret=None):
    """Fused shared-prefix rollout attention over INTERLEAVED (N, dh, S*H)
    prefix caches.  bf16, or int8 with in-kernel dequant when per-column
    scales (N, S*H) are given.  ``group`` batch elements share one grid
    program (default: largest of 8/4/2/1 dividing N) — the G=1 grid is
    program-dispatch-bound, not DMA-bound.  Output-compatible with
    ``attention.shared_prefix_attention``."""
    interpret = _resolve_interpret(interpret)
    n, dh, sh = k_il.shape
    q4, kb, vb, b, bw, h, _ = _prep_qb(q, k_block, v_block, n)
    assert h == heads
    if group is None:
        # largest g whose double-buffered blocks + masks fit the scoped
        # VMEM we request below (bench-scale beams shapes blew the 8-way
        # pick: blocks alone are g*2*h*b*bw*dh elements)
        kv_bytes = 1 if k_il.dtype == jnp.int8 else 2
        hb = h * b

        def vmem_est(g):
            per_buf = (2 * g * dh * sh * kv_bytes        # prefix K/V
                       + (4 * g * sh if k_scale is not None else 0)
                       + 2 * g * hb * bw * dh * 2        # blocks
                       + 2 * g * hb * dh * 2)            # q + out
            # masks scratch + Mosaic stack for the body's f32 score/prob
            # intermediates.  The per-``gi`` loop is UNROLLED, and Mosaic
            # keeps each iteration's live values on the kernel stack — the
            # body term scales with g (measured: a g=8 pick at
            # (hb=256, bw=16) allocated 68.6 MB against a 60.5 MB scoped
            # limit with a g-independent estimate).
            body = g * 6 * (hb * sh + hb * hb * bw) * 4
            return 2 * per_buf + 2 * (hb * sh + hb * hb * bw) * 4 + body
        budget = 48 * 1024 * 1024
        group = next(g for g in (8, 4, 2, 1)
                     if n % g == 0 and (g == 1 or vmem_est(g) <= budget))
    g = group
    hb = h * b
    q4 = (q4.astype(jnp.float32) / math.sqrt(dh)).astype(q4.dtype)
    idx = jnp.stack([jnp.asarray(index0, jnp.int32),
                     jnp.asarray(block_index, jnp.int32)])

    quant = k_scale is not None
    in_specs = [
        pl.BlockSpec((g, h, b, dh), lambda i, idx: (i, 0, 0, 0)),
        pl.BlockSpec((g, dh, sh), lambda i, idx: (i, 0, 0)),
    ]
    args = [q4, k_il]
    if quant:
        # Scales carry a singleton middle dim so the block's trailing two
        # dims equal the array dims (Mosaic tiling rule).
        in_specs.append(pl.BlockSpec((g, 1, sh), lambda i, idx: (i, 0, 0)))
        args.append(k_scale[:, None, :])
    in_specs.append(pl.BlockSpec((g, dh, sh), lambda i, idx: (i, 0, 0)))
    args.append(v_il)
    if quant:
        in_specs.append(pl.BlockSpec((g, 1, sh), lambda i, idx: (i, 0, 0)))
        args.append(v_scale[:, None, :])
    in_specs += [
        pl.BlockSpec((g, h, b, bw, dh), lambda i, idx: (i, 0, 0, 0, 0)),
        pl.BlockSpec((g, h, b, bw, dh), lambda i, idx: (i, 0, 0, 0, 0)),
    ]
    args += [kb, vb]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n // g,), in_specs=in_specs,
        out_specs=pl.BlockSpec((g, h, b, dh), lambda i, idx: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((hb, sh), jnp.float32),
                        pltpu.VMEM((hb, hb * bw), jnp.float32)])
    kernel = functools.partial(
        _kernel_flat_int8 if quant else _kernel_flat_bf16,
        upcast=interpret)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((n, h, b, dh), q.dtype),
        grid_spec=grid_spec,
        # the default ~16 MB scoped-VMEM cap is far below the chip's real
        # VMEM (~64+ MB usable, scripts/probe_vmem; 100 MB compiles on
        # v5e) — raise it so larger groups fit their double-buffered K/V
        # blocks and the body's f32 score intermediates at beams shapes
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(idx, *args)
    return out.transpose(0, 2, 1, 3).reshape(q.shape[0], 1, q.shape[2])


@functools.partial(jax.jit, static_argnames=("interpret",))
def shared_prefix_attention_fused_int8(q, k8t_shared, k_scale, v8t_shared,
                                       v_scale, k_block, v_block, index0,
                                       block_index, interpret=None):
    """int8 shared-prefix rollout attention with IN-KERNEL dequantization.

    The prefix K/V stream from HBM as dense int8 (N, H, dh, S) tiles — half
    the bytes of bf16 — with per-slot symmetric scales (N, H, S) bf16.  The
    scales fold into the f32 score matrix (K side) and the softmax
    probabilities (V side), so no dequantized copy of the cache ever
    materializes (the XLA int8 path's bottleneck, ``ops/kv_quant.py``).
    """
    interpret = _resolve_interpret(interpret)
    n, h, dh, s = k8t_shared.shape
    q4, kb, vb, b, bw, _, _ = _prep_qb(q, k_block, v_block, n)
    scale = 1.0 / math.sqrt(dh)
    idx = jnp.stack([jnp.asarray(index0, jnp.int32),
                     jnp.asarray(block_index, jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, b, dh), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, dh, s), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, s), lambda i, idx: (i, 0, 0)),
            pl.BlockSpec((1, h, dh, s), lambda i, idx: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, s), lambda i, idx: (i, 0, 0)),
            pl.BlockSpec((1, h, b, bw, dh), lambda i, idx: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, h, b, bw, dh), lambda i, idx: (i, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, b, dh), lambda i, idx: (i, 0, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_t_int8, scale=scale, upcast=interpret),
        out_shape=jax.ShapeDtypeStruct((n, h, b, dh), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, q4, k8t_shared, k_scale, v8t_shared, v_scale, kb, vb)
    return out.transpose(0, 2, 1, 3).reshape(q.shape[0], 1, q.shape[2])
