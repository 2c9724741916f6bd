"""Fused decoder-layer decode step (Pallas TPU megakernel).

One ``pallas_call`` runs an ENTIRE decoder layer for one rollout decode
step — AdaLN/LN norm, packed 2-layer QKV MLP, shared-prefix attention
(prefix + per-rollout block + the current token's self term), the
optional cross-attention block, and the FFN block — for a chunk of batch
elements per grid program.

Why: the XLA decode step runs attention's prefix-K/V DMA and the layer's
matmuls strictly sequentially (measured: parts sum to the whole,
docs/PERFORMANCE.md "step anatomy").  Inside one kernel Mosaic
double-buffers the next chunk's cache DMA under the current chunk's
matmul/VPU work, so the step approaches max(DMA, compute) instead of
their sum.

Mosaic cannot split or merge the 128-lane axis of a vector (and is picky
about sublane regrouping), which shapes the whole design:

  - Per-head q/k/v are NOT sliced out of the (R, D) activation; the
    projection weights arrive PRE-SPLIT as (H, dh, hidden) stacks and
    each head comes from its own 2-D dot against ``w_ref[h]``.
  - Rows are regrouped between the (R = elem*B + beam, dh) projection
    order and the per-element (H*B, dh) attention order with constant
    0/1 PERMUTATION-MATRIX dots (MXU work, no reshapes): Q_all = sum_h
    P_h @ q_h, and the attention output returns via o_h = P_h^T @ o_all.
  - The attention output re-enters the (R, D) stream through an
    accumulated sum of per-head residual-projection dots against the
    pre-split (H, dh, D) residual weight stack.
  - The per-rollout block K/V append is NOT done in-kernel (dynamic
    4-D scatter): the kernel attends over the OLD block slots
    (t < block_index) plus an explicit diagonal self term q_row·k_new_row
    (each row only ever attends to its own block), and emits k_new/v_new
    as (H, R, dh) outputs for a cheap XLA-side append in the wrapper —
    numerically identical to append-then-attend.

Layout contracts (see ops/decode_attention.py):
  - prefix K/V interleaved (N, dh, S*H), column = slot*H + head.
  - cross K/V interleaved (N, dh, Sc*H) (never masked).
  - per-rollout blocks (N*B, H, bw, dh) outside; streamed to the kernel
    flattened as (N*B*H*bw, dh).

All conditioning (AdaLN-Zero scale/shift, DiT residual gates, affine-LN
weights) collapses to per-step (D,) vectors computed OUTSIDE the kernel
(the conditioning vector is shared by every token of a step), so one
kernel body serves use_pos_cond and plain-LN models alike.  The softmax
scale 1/sqrt(dh) is folded into the q-side l1 weights/biases outside.

Reference equivalent: the per-token body of the beam-search decode loop,
``/root/reference/generate_images.py:256-337`` +
``/root/reference/models/layers.py:370-667`` (uncached there).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _silu(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _ln(x, a_ref, b_ref, eps=1e-5):
    """Affine layer norm with prefolded (D,) scale/shift vectors."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xn * a_ref[0].astype(jnp.float32)
            + b_ref[0].astype(jnp.float32)).astype(x.dtype)


def _mm(x, w_ref, b_ref=None, act=False):
    y = jax.lax.dot_general(
        x, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if b_ref is not None:
        y = y + b_ref[0].astype(jnp.float32)
    y = y.astype(x.dtype)
    return _silu(y) if act else y


def _residual(x, x_skip, w_ref, b_ref, gate_ref):
    if gate_ref is not None:
        x = (x.astype(jnp.float32)
             * gate_ref[0].astype(jnp.float32)).astype(x.dtype)
    y = _mm(x, w_ref, b_ref)
    return _silu(y + x_skip)


def _heads_project(h0_slice, w_ref, b_ref, h):
    """Per-head projections: h0_slice (R, hidden) against the pre-split
    stack w_ref (H, dh, hidden) + b_ref (H, 1, dh).  Returns a list of H
    (R, dh) matrices (Mosaic can't lane-split a (R, D) result)."""
    outs = []
    for hh in range(h):
        y = jax.lax.dot_general(
            h0_slice, w_ref[hh], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append((y + b_ref[hh].astype(jnp.float32))
                    .astype(h0_slice.dtype))
    return outs


def _assemble(per_head, p_ref, h):
    """H x (R, dh) per-head rows -> (Nc*H*B, dh), row = (elem*H + head)*B
    + beam, via the constant permutation stack p_ref (H, Nc*H*B, R)."""
    acc = None
    for hh in range(h):
        y = jax.lax.dot_general(
            p_ref[hh].astype(per_head[hh].dtype), per_head[hh],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc.astype(per_head[0].dtype)


def _disassemble(o_all, p_ref, hh):
    """(Nc*H*B, dh) f32 attention rows -> head hh's (R, dh) rows:
    P_h^T @ o_all (contract over the assembled-row axis)."""
    return jax.lax.dot_general(
        p_ref[hh].astype(o_all.dtype), o_all, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _heads_residual(o_all, x_skip, p_ref, w_ref, b_ref, gate_ref, h):
    """Attention output (Nc*H*B, dh) f32 -> residual-block output (R, D).

    Per head: permute rows back to projection order, apply the DiT gate,
    project through the pre-split residual stack (H, dh, D), accumulate
    (this accumulation IS the head re-merge), then activation(y+skip)."""
    r, d = x_skip.shape
    acc = jnp.zeros((r, d), jnp.float32)
    for hh in range(h):
        o_h = _disassemble(o_all, p_ref, hh)                 # (R, dh) f32
        if gate_ref is not None:
            o_h = o_h * gate_ref[hh].astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            o_h.astype(x_skip.dtype), w_ref[hh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y = (acc + b_ref[0].astype(jnp.float32)).astype(x_skip.dtype)
    return _silu(y + x_skip)


def _weight_names(use_cross, gated):
    return ([
        "a_s", "b_s", "l0w", "l0b", "l1wq", "l1bq", "l1wk", "l1bk",
        "l1wv", "l1bv", "res_s_w", "res_s_b",
    ] + (["gate_s"] if gated else []) + ([
        "a_c", "b_c", "cq_l0w", "cq_l0b", "cq_l1w", "cq_l1b",
        "res_c_w", "res_c_b"] + (["gate_c"] if gated else [])
        if use_cross else []) + [
        "a_f", "b_f", "f_l0w", "f_l0b", "f_l1w", "f_l1b",
        "res_f_w", "res_f_b",
    ] + (["gate_f"] if gated else []))


def _layer_kernel(idx_ref, x_ref, kil_ref, vil_ref, bkf_ref, bvf_ref,
                  ckil_ref, cvil_ref, p_ref, *w, out_ref, kn_ref, vn_ref,
                  ms_ref, mb_ref, mc_ref, use_cross, gated, heads, beams,
                  parts=("attn", "cross", "ffn")):
    index0 = idx_ref[0]
    block_index = idx_ref[1]
    W = dict(zip(_weight_names(use_cross, gated), w))

    r, d = x_ref.shape
    h = heads
    b = beams
    nc = r // b
    dh = d // h
    bh = b * h
    sh = kil_ref.shape[2]
    bhw = bkf_ref.shape[0] // nc          # per-element old-block rows
    bw = bhw // bh
    hidden = W["l1wq"].shape[2]

    # additive masks, built once into scratch persisting across the
    # sequential grid.  Attention rows are (head*B + beam).
    @pl.when(pl.program_id(0) == 0)
    def _build_masks():
        row = jax.lax.broadcasted_iota(jnp.int32, (bh, sh), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (bh, sh), 1)
        valid_s = jnp.logical_and(row // b == col % h, col // h < index0)
        ms_ref[...] = jnp.where(valid_s, 0.0, NEG).astype(jnp.float32)
        # old-block cols follow the (B, H, bw) flattening of the engine's
        # (R, H, bw, dh) layout: c2 = (beam*H + head)*bw + t, STRICT
        # t < block_index (slot block_index is this step's self term)
        r2 = jax.lax.broadcasted_iota(jnp.int32, (bh, bhw), 0)
        c2 = jax.lax.broadcasted_iota(jnp.int32, (bh, bhw), 1)
        valid_b = (jnp.logical_and(r2 % b == c2 // (h * bw),
                                   r2 // b == (c2 // bw) % h)
                   & ((c2 % bw) < block_index))
        mb_ref[...] = jnp.where(valid_b, 0.0, NEG).astype(jnp.float32)
        if mc_ref is not None:
            csh = mc_ref.shape[1]
            r3 = jax.lax.broadcasted_iota(jnp.int32, (bh, csh), 0)
            c3 = jax.lax.broadcasted_iota(jnp.int32, (bh, csh), 1)
            mc_ref[...] = jnp.where(r3 // b == c3 % h, 0.0,
                                    NEG).astype(jnp.float32)

    x0 = x_ref[...]                                   # (R, D)

    # -- self-attention block ------------------------------------------
    xn = _ln(x0, W["a_s"], W["b_s"])
    h0 = _mm(xn, W["l0w"], W["l0b"], act=True)        # (R, 3*hidden)
    q_h = _heads_project(h0[:, :hidden], W["l1wq"], W["l1bq"], h)
    k_h = _heads_project(h0[:, hidden:2 * hidden], W["l1wk"], W["l1bk"], h)
    v_h = _heads_project(h0[:, 2 * hidden:], W["l1wv"], W["l1bv"], h)

    # this step's K/V leave as outputs; the wrapper appends them to the
    # per-rollout blocks with one XLA dynamic_update_slice
    for hh in range(h):
        kn_ref[hh] = k_h[hh]
        vn_ref[hh] = v_h[hh]

    if "attn" not in parts:                           # probe attribution
        out_ref[...] = x0
        return

    q_all = _assemble(q_h, p_ref, h)                  # (Nc*HB, dh)
    v_all = _assemble(v_h, p_ref, h)
    # diagonal self term: q is pre-scaled, k_new is this row's slot
    # block_index entry (rows only attend to their own rollout block)
    s_h = [jnp.sum(q_h[hh].astype(jnp.float32)
                   * k_h[hh].astype(jnp.float32), axis=1, keepdims=True)
           for hh in range(h)]
    self_all = _assemble(s_h, p_ref, h).astype(jnp.float32)  # (Nc*HB, 1)

    mask_s = ms_ref[...]
    mask_b = mb_ref[...]
    bkf = bkf_ref[...]
    bvf = bvf_ref[...]

    outs = []
    for e in range(nc):
        q2 = q_all[e * bh:(e + 1) * bh]               # (HB, dh) pre-scaled
        sc_s = jax.lax.dot_general(
            q2, kil_ref[e], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + mask_s      # (HB, S*H)
        kb_e = bkf[e * bhw:(e + 1) * bhw]             # (BH*bw, dh) old
        sc_b = jax.lax.dot_general(
            q2, kb_e, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + mask_b      # (HB, BH*bw)
        sc_d = self_all[e * bh:(e + 1) * bh]          # (HB, 1)
        m = jnp.maximum(
            jnp.maximum(jnp.max(sc_s, axis=1, keepdims=True),
                        jnp.max(sc_b, axis=1, keepdims=True)), sc_d)
        p_s = jnp.exp(sc_s - m)
        p_b = jnp.exp(sc_b - m)
        p_d = jnp.exp(sc_d - m)                       # (HB, 1)
        denom = (jnp.sum(p_s, axis=1, keepdims=True)
                 + jnp.sum(p_b, axis=1, keepdims=True) + p_d)
        o_s = jax.lax.dot_general(
            p_s.astype(jnp.bfloat16), vil_ref[e], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (HB, dh)
        o_b = jax.lax.dot_general(
            p_b.astype(jnp.bfloat16), bvf[e * bhw:(e + 1) * bhw],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_d = p_d * v_all[e * bh:(e + 1) * bh].astype(jnp.float32)
        outs.append((o_s + o_b + o_d) / denom)
    o_all = jnp.concatenate(outs, axis=0)             # (Nc*HB, dh) f32

    x1 = _heads_residual(o_all, x0, p_ref, W["res_s_w"], W["res_s_b"],
                         W.get("gate_s"), h)

    # -- cross-attention block -----------------------------------------
    if use_cross and "cross" in parts:
        xn2 = _ln(x1, W["a_c"], W["b_c"])
        hq = _mm(xn2, W["cq_l0w"], W["cq_l0b"], act=True)
        qc_h = _heads_project(hq, W["cq_l1w"], W["cq_l1b"], h)
        qc_all = _assemble(qc_h, p_ref, h)
        mask_c = mc_ref[...]
        couts = []
        for e in range(nc):
            sc_c = jax.lax.dot_general(
                qc_all[e * bh:(e + 1) * bh], ckil_ref[e],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + mask_c
            m_c = jnp.max(sc_c, axis=1, keepdims=True)
            p_c = jnp.exp(sc_c - m_c)
            d_c = jnp.sum(p_c, axis=1, keepdims=True)
            o_c = jax.lax.dot_general(
                p_c.astype(jnp.bfloat16), cvil_ref[e],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            couts.append(o_c / d_c)
        oc_all = jnp.concatenate(couts, axis=0)
        x1 = _heads_residual(oc_all, x1, p_ref, W["res_c_w"], W["res_c_b"],
                             W.get("gate_c"), h)

    # -- FFN block ------------------------------------------------------
    if "ffn" not in parts:
        out_ref[...] = x1
        return
    xn3 = _ln(x1, W["a_f"], W["b_f"])
    hf = _mm(xn3, W["f_l0w"], W["f_l0b"], act=True)
    hf = _mm(hf, W["f_l1w"], W["f_l1b"], act=True)    # act on both layers
    out_ref[...] = _residual(hf, x1, W["res_f_w"], W["res_f_b"],
                             W.get("gate_f"))


def _split_heads_w(w, h):
    """(hidden, D) head-output projection -> per-head stack
    (H, dh, hidden) consumed by ``dot(x, w_ref[hh], contract (1, 1))``."""
    hidden, d = w.shape
    return w.reshape(hidden, h, d // h).transpose(1, 2, 0)


def _split_heads_vec(v, h):
    """(D,)/(1, D) head-major feature vector -> (H, 1, dh)."""
    return jnp.reshape(v, (h, 1, -1))


def fold_layer_weights(layer_params, packed, cfg, pos_cond_emb=None):
    """Collapse a decoder layer's params + the step's conditioning into
    the megakernel's flat weight list.

    Head-touching projections are pre-split into (H, dh, hidden) /
    (H, dh, D) stacks (see the module docstring); conditioning (AdaLN
    scale/shift, DiT gates) collapses to per-step vectors.

    ``pos_cond_emb``: (1, 1, D) AdaLN conditioning vector for this step
    (None for plain-LN models).  Returns (weights, use_cross, gated)."""
    from qaig_tpu.models import core

    d = packed["l0w"].shape[0]
    h = cfg.self_attn_heads

    def norm_vectors(norm_params):
        if pos_cond_emb is not None:
            cond = pos_cond_emb[0]                       # (1, D)
            a = core.linear(norm_params["scale"], cond)  # (1, D)
            b = core.linear(norm_params["shift"], cond)
            return a, b
        return (norm_params["g"][None].astype(jnp.float32),
                norm_params["b"][None].astype(jnp.float32))

    def gate_vector(res_params):
        if pos_cond_emb is None or "scale" not in res_params:
            return None
        return core.linear(res_params["scale"], pos_cond_emb[0])

    gated = pos_cond_emb is not None

    sa = layer_params["self_attn"]
    a_s, b_s = norm_vectors(sa["norm"])
    scale = 1.0 / math.sqrt(d // h)
    w = {
        "a_s": a_s, "b_s": b_s,
        "l0w": packed["l0w"], "l0b": packed["l0b"][None],
        "l1wq": _split_heads_w(packed["l1w"][0] * scale, h),
        "l1bq": _split_heads_vec(packed["l1b"][0] * scale, h),
        "l1wk": _split_heads_w(packed["l1w"][1], h),
        "l1bk": _split_heads_vec(packed["l1b"][1], h),
        "l1wv": _split_heads_w(packed["l1w"][2], h),
        "l1bv": _split_heads_vec(packed["l1b"][2], h),
        "res_s_w": sa["res"]["linear"]["w"].reshape(h, d // h, d),
        "res_s_b": sa["res"]["linear"]["b"][None],
    }
    if gated:
        w["gate_s"] = _split_heads_vec(gate_vector(sa["res"]), h)

    use_cross = "cross_attn" in layer_params
    if use_cross:
        ch = cfg.cross_attn_heads or cfg.self_attn_heads
        assert ch == h, "megakernel assumes cross heads == self heads"
        ca = layer_params["cross_attn"]
        a_c, b_c = norm_vectors(ca["norm"])
        cscale = 1.0 / math.sqrt(d // ch)
        w.update({
            "a_c": a_c, "b_c": b_c,
            "cq_l0w": ca["attn"]["q"]["l0"]["w"],
            "cq_l0b": ca["attn"]["q"]["l0"]["b"][None],
            "cq_l1w": _split_heads_w(ca["attn"]["q"]["l1"]["w"] * cscale, h),
            "cq_l1b": _split_heads_vec(ca["attn"]["q"]["l1"]["b"] * cscale,
                                       h),
            "res_c_w": ca["res"]["linear"]["w"].reshape(h, d // h, d),
            "res_c_b": ca["res"]["linear"]["b"][None],
        })
        if gated:
            w["gate_c"] = _split_heads_vec(gate_vector(ca["res"]), h)

    ff = layer_params["ffn"]
    a_f, b_f = norm_vectors(ff["norm"])
    w.update({
        "a_f": a_f, "b_f": b_f,
        "f_l0w": ff["ff"]["l0"]["w"], "f_l0b": ff["ff"]["l0"]["b"][None],
        "f_l1w": ff["ff"]["l1"]["w"], "f_l1b": ff["ff"]["l1"]["b"][None],
        "res_f_w": ff["res"]["linear"]["w"],
        "res_f_b": ff["res"]["linear"]["b"][None],
    })
    if gated:
        w["gate_f"] = gate_vector(ff["res"])

    return ([w[n] for n in _weight_names(use_cross, gated)],
            use_cross, gated)


@functools.partial(jax.jit, static_argnames=("h", "b", "nc"))
def _perm_stack(h, b, nc):
    """Constant permutation stack P (H, Nc*H*B, Nc*B) bf16:
    P[hh, row, src] = 1 iff row = (elem*H + hh)*B + beam and
    src = elem*B + beam."""
    r = nc * b
    rows = np.arange(nc * h * b)
    srcs = np.arange(r)
    e_row, rem = rows // (h * b), rows % (h * b)
    h_row, b_row = rem // b, rem % b
    p = ((e_row[None, :, None] == (srcs // b)[None, None, :])
         & (b_row[None, :, None] == (srcs % b)[None, None, :])
         & (h_row[None, :, None] == np.arange(h)[:, None, None]))
    return jnp.asarray(p, jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "beams", "use_cross", "gated", "chunk",
                     "parts"))
def decode_layer_fused(x, k_il, v_il, bk, bv, ck_il, cv_il, weights,
                       index0, block_index, heads, beams, use_cross,
                       gated, chunk=16, parts=("attn", "cross", "ffn")):
    """One fused decoder layer for one rollout decode step.

    Args:
      x: (N*B, D) residual-stream rows.
      k_il/v_il: (N, dh, S*H) interleaved shared prefix.
      bk/bv: (N*B, H, bw, dh) per-rollout blocks (returned updated).
      ck_il/cv_il: (N, dh, Sc*H) interleaved cross K/V (or None).
      weights: flat list from :func:`fold_layer_weights`.
      chunk: batch elements per grid program.

    Returns (x_next (N*B, D), bk_updated, bv_updated).
    """
    nb, d = x.shape
    n = k_il.shape[0]
    b = nb // n
    sh = k_il.shape[2]
    bw = bk.shape[2]
    h = heads
    dh = d // h
    bh = b * h
    nc = min(chunk, n)
    if n % nc != 0:
        raise ValueError(
            f"decode_layer_fused: chunk {nc} must divide the batch {n} "
            f"(the grid would silently drop the remainder rows)")
    r = nc * b
    rbh = nc * bh
    rhw = r * h * bw

    idx = jnp.stack([jnp.asarray(index0, jnp.int32),
                     jnp.asarray(block_index, jnp.int32)])
    pstack = _perm_stack(h, b, nc)
    bkf = bk.reshape(nb * h * bw, dh)
    bvf = bv.reshape(nb * h * bw, dh)

    in_specs = [
        pl.BlockSpec((r, d), lambda i, idx: (i, 0)),
        pl.BlockSpec((nc, dh, sh), lambda i, idx: (i, 0, 0)),
        pl.BlockSpec((nc, dh, sh), lambda i, idx: (i, 0, 0)),
        pl.BlockSpec((rhw, dh), lambda i, idx: (i, 0)),
        pl.BlockSpec((rhw, dh), lambda i, idx: (i, 0)),
    ]
    args = [x, k_il, v_il, bkf, bvf]
    if use_cross:
        csh = ck_il.shape[2]
        in_specs += [
            pl.BlockSpec((nc, dh, csh), lambda i, idx: (i, 0, 0)),
            pl.BlockSpec((nc, dh, csh), lambda i, idx: (i, 0, 0)),
        ]
        args += [ck_il, cv_il]
    else:
        # placeholder refs (never read)
        in_specs += [
            pl.BlockSpec((1, 1, 128), lambda i, idx: (0, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda i, idx: (0, 0, 0)),
        ]
        z = jnp.zeros((1, 1, 128), x.dtype)
        args += [z, z]
    in_specs.append(pl.BlockSpec(pstack.shape, lambda i, idx: (0, 0, 0)))
    args.append(pstack)
    for wgt in weights:
        shape = wgt.shape
        in_specs.append(
            pl.BlockSpec(shape, lambda i, idx, _nd=len(shape): (0,) * _nd))
        args.append(wgt)

    scratch = [pltpu.VMEM((bh, sh), jnp.float32),
               pltpu.VMEM((bh, bh * bw), jnp.float32)]
    if use_cross:
        scratch.append(pltpu.VMEM((bh, ck_il.shape[2]), jnp.float32))
    n_scratch = len(scratch)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n // nc,), in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((r, d), lambda i, idx: (i, 0)),
            pl.BlockSpec((h, r, dh), lambda i, idx: (0, i, 0)),
            pl.BlockSpec((h, r, dh), lambda i, idx: (0, i, 0)),
        ],
        scratch_shapes=scratch)

    def kernel(idx_ref, x_ref, kil_ref, vil_ref, bkf_ref, bvf_ref,
               ckil_ref, cvil_ref, p_ref, *rest):
        w = rest[:-(3 + n_scratch)]
        out_ref, kn_ref, vn_ref = rest[-(3 + n_scratch):-n_scratch]
        if use_cross:
            ms_ref, mb_ref, mc_ref = rest[-3:]
        else:
            (ms_ref, mb_ref), mc_ref = rest[-2:], None
        _layer_kernel(idx_ref, x_ref, kil_ref, vil_ref, bkf_ref, bvf_ref,
                      ckil_ref, cvil_ref, p_ref, *w, out_ref=out_ref,
                      kn_ref=kn_ref, vn_ref=vn_ref, ms_ref=ms_ref,
                      mb_ref=mb_ref, mc_ref=mc_ref, use_cross=use_cross,
                      gated=gated, heads=heads, beams=beams, parts=parts)

    out, k_new, v_new = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((nb, d), x.dtype),
                   jax.ShapeDtypeStruct((h, nb, dh), x.dtype),
                   jax.ShapeDtypeStruct((h, nb, dh), x.dtype)],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, *args)

    # XLA-side block append (the kernel attended old slots + self term)
    kn = k_new.transpose(1, 0, 2)[:, :, None, :]      # (NB, H, 1, dh)
    vn = v_new.transpose(1, 0, 2)[:, :, None, :]
    bk2 = jax.lax.dynamic_update_slice_in_dim(bk, kn.astype(bk.dtype),
                                              block_index, 2)
    bv2 = jax.lax.dynamic_update_slice_in_dim(bv, vn.astype(bv.dtype),
                                              block_index, 2)
    return out, bk2, bv2


def interleave_cross(ckv_t):
    """presplit (N, H, dh, Sc) cross K/V -> interleaved (N, dh, Sc*H)."""
    n, h, dh, s = ckv_t.shape
    return ckv_t.transpose(0, 2, 3, 1).reshape(n, dh, s * h)
