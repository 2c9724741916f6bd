"""Pipeline parallelism (GPipe schedule) for the transformer decoder stack.

The reference is single-device (SURVEY §2f lists pipeline parallelism as
absent); this module adds it as a config-gated training-scale feature: the
decoder layers are partitioned over a ``pipe`` mesh axis and microbatches
flow stage-to-stage over ICI via ``lax.ppermute`` inside one ``shard_map``.
Everything outside the decoder stack (embeddings, the coarse-token encoder,
position conditioning, the classifier head) stays in ordinary GSPMD land —
those pieces are tiny next to the decoder layers, which hold the bulk of
the parameters and FLOPs at reference shapes.

Schedule: classic GPipe.  With ``P`` stages and ``M`` microbatches the
pipeline runs ``M + P - 1`` ticks; at tick ``t`` stage ``p`` processes
microbatch ``t - p`` (out-of-range ticks compute masked garbage that never
reaches the output).  Bubble fraction is ``(P - 1) / (M + P - 1)`` — pick
``--num-microbatches`` a few times the stage count to amortize it.

Autodiff runs straight through the ``shard_map``/``ppermute``/``scan``
pipeline (the transpose of a shift is the reverse shift), so one
``jax.value_and_grad`` of the usual loss trains the pipelined model; the
grads of stage-local layer stacks come back sharded over ``pipe`` and the
grads of the replicated embeddings/encoder/classifier are psum-reduced by
shard_map's transpose.  ``tests/test_pipeline_parallel.py`` pins logits,
grads, and whole train steps against the unpipelined path.

Storage contract: checkpoints keep the reference's per-layer-list schema
(``decoder_layers`` is a list); the training loop stores the stacked form
(leaves ``(L, ...)`` sharded ``P('pipe')``) and converts at save/restore
via ``stack_params``/``unstack_params`` — both also walk optimizer-state
pytrees (Adam moments mirror the param tree).
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from qaig_tpu.models import blocks
from qaig_tpu.utils.checkpoint import flatten_tree, unflatten_tree


# -- stacked <-> per-layer-list conversions ----------------------------------

def stack_layer_list(layers):
    """[{...} x L] -> one pytree with leaves stacked on a new axis 0."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_list(stacked, num_layers):
    """Inverse of :func:`stack_layer_list`."""
    return [jax.tree_util.tree_map(lambda x: x[i], stacked)
            for i in range(num_layers)]


def _map_decoder_layers(tree, fn):
    """Apply ``fn`` to every ``decoder_layers`` subtree found in ``tree``
    (params dicts and optimizer-state namedtuples alike)."""
    if isinstance(tree, dict):
        return {k: (fn(v) if k == "decoder_layers"
                    else _map_decoder_layers(v, fn))
                for k, v in tree.items()}
    if isinstance(tree, tuple):
        mapped = [_map_decoder_layers(v, fn) for v in tree]
        if hasattr(tree, "_fields"):  # namedtuple (optax states)
            return type(tree)(*mapped)
        return tuple(mapped)
    if isinstance(tree, list):
        return [_map_decoder_layers(v, fn) for v in tree]
    return tree


def stack_params(tree):
    """Convert every ``decoder_layers`` list in a params or optimizer-state
    pytree to stacked form (checkpoint schema -> pipeline training form)."""
    return _map_decoder_layers(
        tree, lambda v: stack_layer_list(v) if isinstance(v, list) else v)


def unstack_params(tree, num_layers):
    """Inverse of :func:`stack_params` (pipeline form -> checkpoint
    schema)."""
    return _map_decoder_layers(
        tree, lambda v: (unstack_layer_list(v, num_layers)
                         if not isinstance(v, list) else v))


def pipeline_param_spec(params):
    """PartitionSpec tree for stacked-form params: decoder layer stacks are
    sharded over ``pipe`` on their leading (layer) axis AND (composing with
    tensor parallelism) Megatron-split over ``model`` on their MLP dims via
    the same ``_mlp_rule`` the plain TP spec uses; non-decoder params keep
    the ordinary TP spec.  With a size-1 model axis every ``model`` entry
    degenerates to replicated, so one spec serves PP and PP×TP."""
    from qaig_tpu.parallel.sharding import _mlp_rule

    flat = flatten_tree(params)
    spec_flat = {}
    for path in flat:
        tp = _mlp_rule(path)
        if path.startswith("decoder_layers."):
            spec_flat[path] = P("pipe", *tp) if tp is not None else P("pipe")
        else:
            spec_flat[path] = tp if tp is not None else P()
    return unflatten_tree(spec_flat, like=params)


# -- the pipelined forward ----------------------------------------------------

def pipelined_apply(model, params, x_dec, x_enc=None, pos_cond=None, *,
                    mesh, num_microbatches):
    """Teacher-forcing forward identical to ``Transformer.apply`` with the
    decoder stack pipelined over ``mesh``'s ``pipe`` axis.

    ``params`` may carry ``decoder_layers`` in either per-layer-list or
    stacked form.  Requires ``num_dec_layers % pipe == 0``,
    ``N % num_microbatches == 0`` and ``(N / num_microbatches) % data == 0``.
    """
    cfg = model.cfg
    n_pipe = mesh.shape["pipe"]
    n_data = mesh.shape["data"]
    M = int(num_microbatches)
    L = cfg.num_dec_layers
    if L % n_pipe:
        raise ValueError(
            f"num_dec_layers {L} not divisible by pipe={n_pipe}")
    N = x_dec.shape[0]
    if N % M:
        raise ValueError(f"batch {N} not divisible by "
                         f"num_microbatches {M}")
    if (N // M) % n_data:
        raise ValueError(
            f"microbatch {N // M} not divisible by the mesh data axis "
            f"{n_data} — lower --num-microbatches or pad the batch")

    dec = params["decoder_layers"]
    stacked = stack_layer_list(dec) if isinstance(dec, list) else dec

    enc_out = model.encode(params, x_enc) if cfg.use_encoder else None
    h = model.embed_decoder(params, x_dec)
    cond = (model.pos_cond_embedding(params, pos_cond)
            if cfg.use_pos_cond else None)

    def mb_split(a):
        return None if a is None else a.reshape((M, N // M) + a.shape[1:])

    h_mb, enc_mb, cond_mb = mb_split(h), mb_split(enc_out), mb_split(cond)

    dec_cfg = model.dec_block_cfg
    block_fn = lambda lp, x, cross, cnd: blocks.transformer_block(
        lp, dec_cfg, x, cross_cond=cross, pos_cond=cnd)
    if cfg.use_remat:
        block_fn = jax.checkpoint(block_fn)

    def body(stacked_local, h_mb, enc_mb, cond_mb):
        # Per-device: stacked_local leaves are (L/pipe, ...); activations
        # are this data-shard's microbatches.
        p_idx = lax.axis_index("pipe")
        T = M + n_pipe - 1
        zero = jnp.zeros(h_mb.shape[1:], h_mb.dtype)

        def pick(buf, i):
            return (None if buf is None
                    else lax.dynamic_index_in_dim(buf, i, 0, keepdims=False))

        def tick(state, t):
            carry, out = state
            mb_i = jnp.clip(t - p_idx, 0, M - 1)
            # stage 0 injects a fresh microbatch; later stages consume the
            # activation ppermute'd in from the previous stage
            x = jnp.where(p_idx == 0, pick(h_mb, jnp.minimum(t, M - 1)),
                          carry)
            cross, cnd = pick(enc_mb, mb_i), pick(cond_mb, mb_i)

            def layer(xc, lp):
                return block_fn(lp, xc, cross, cnd), None

            y, _ = lax.scan(layer, x, stacked_local)

            # only the LAST stage's in-schedule outputs are real
            take = ((p_idx == n_pipe - 1) & (t - p_idx >= 0)
                    & (t - p_idx < M))
            out = lax.dynamic_update_index_in_dim(
                out, jnp.where(take, y, pick(out, mb_i)), mb_i, 0)
            carry = lax.ppermute(y, "pipe",
                                 [(i, i + 1) for i in range(n_pipe - 1)])
            return (carry, out), None

        out0 = jnp.zeros_like(h_mb)
        (_, out), _ = lax.scan(tick, (zero, out0), jnp.arange(T))
        # out is nonzero only on the last stage; summing over 'pipe'
        # broadcasts it everywhere (and makes the output pipe-invariant)
        return lax.psum(out, "pipe")

    # With TP active the shard_map is manual over ('data', 'pipe') only:
    # the 'model' axis stays in GSPMD hands, so Megatron shardings on the
    # stacked layer weights survive into the body and XLA inserts the
    # per-MLP all-reduce there — PP and TP compose on one
    # ('data', 'pipe', 'model') mesh.  Without TP all axes are manual
    # (this toolchain's XLA:CPU aborts compiling some bf16 programs under
    # partial-manual meshes with a size-1 auto axis, so partial-manual is
    # reserved for when it buys something).
    act_spec = P(None, "data")
    pipe_specs = jax.tree_util.tree_map(lambda _: P("pipe"), stacked)
    manual = ({"data", "pipe"} if mesh.shape.get("model", 1) > 1
              else frozenset())
    h_out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pipe_specs, act_spec,
                  None if enc_mb is None else act_spec,
                  None if cond_mb is None else act_spec),
        out_specs=act_spec,
        axis_names=manual,
        check_vma=False,
    )(stacked, h_mb, enc_mb, cond_mb)

    h_out = h_out.reshape((N,) + h_out.shape[2:])
    return model.classify(params, h_out)
