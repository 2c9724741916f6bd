"""Sharding rules: batch data-parallel specs + transformer tensor-parallel
partition specs.

TP layout (Megatron-style, applied to every 2-layer MLP in the model — QKV
projections, FFN, pos-cond MLP, classifier): the first linear is column-
sharded over the ``model`` axis, the second row-sharded, so each MLP needs a
single all-reduce (inserted automatically by XLA from the sharding
annotations).  Everything else (embeddings, norms, gates, residual linears)
is replicated — they are tiny next to the MLPs, which hold >90% of the
parameters at reference shapes (hidden_dim 4-8x in_dim).
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from qaig_tpu.utils.checkpoint import flatten_tree, unflatten_tree


def batch_sharding(mesh, ndim=1):
    """Shard the leading (batch) axis over 'data'."""
    spec = [None] * ndim
    spec[0] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh):
    return NamedSharding(mesh, P())


def _mlp_rule(path):
    """PartitionSpec for one flat param path, or None for replicated."""
    if path.endswith(".l0.w"):
        return P(None, "model")
    if path.endswith(".l0.b"):
        return P("model")
    if path.endswith(".l1.w"):
        return P("model", None)
    return None


def transformer_param_spec(params):
    """Pytree of PartitionSpec matching ``params`` (transformer tree)."""
    flat = flatten_tree(params)
    spec_flat = {}
    for path, leaf in flat.items():
        rule = _mlp_rule(path)
        spec_flat[path] = rule if rule is not None else P()
    return unflatten_tree(spec_flat, like=params)


def zero_opt_spec(params, param_spec, n_data, axis="data"):
    """ZeRO-1 PartitionSpec tree for optimizer moments: start from each
    param's spec (so TP-sharded dims stay TP-sharded) and additionally
    shard the LARGEST still-replicated dimension over ``axis``, provided
    its size divides the axis length.  Leaves with no dividable dimension
    keep their param spec (replicated moments) — correctness never depends
    on a leaf being sharded.

    This is the optimizer-state half of ZeRO (Rajbhandari et al. 2020)
    expressed as pure GSPMD sharding: each data-parallel device holds and
    updates 1/``n_data`` of every Adam moment; XLA turns the grad
    all-reduce + moment update + param update into
    reduce-scatter/sharded-update/all-gather from the annotations alone.
    No reference equivalent (the reference is single-device,
    ``train_autoencoder.py:133-136``)."""
    flat_p = flatten_tree(params)
    flat_s = flatten_tree(param_spec)
    out = {}
    for path, leaf in flat_p.items():
        spec = list(flat_s[path]) if flat_s[path] else []
        spec = spec + [None] * (leaf.ndim - len(spec))
        free = [i for i in range(leaf.ndim) if spec[i] is None]
        free.sort(key=lambda i: -leaf.shape[i])
        for i in free:
            if leaf.shape[i] % n_data == 0:
                spec[i] = axis
                break
        out[path] = P(*spec)
    return unflatten_tree(out, like=params)


def shard_opt_state(mesh, optimizer, opt_state, param_spec,
                    moment_spec=None):
    """Place optimizer state on the mesh with param-like leaves (Adam mu/nu)
    sharded exactly like their parameters and everything else (step counts)
    replicated — so TP training never gathers first/second moments.

    ``moment_spec`` (a pytree like ``param_spec``) overrides the placement
    of the param-like leaves — used by ZeRO-1 (:func:`zero_opt_spec`) to
    spread Adam moments over the data axis."""
    import optax

    def place(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return optax.tree_map_params(
        optimizer, place, opt_state,
        moment_spec if moment_spec is not None else param_spec,
        transform_non_params=lambda leaf: place(leaf, P()))


def constrain_opt_state(optimizer, opt_state, mesh, moment_spec):
    """``with_sharding_constraint`` over an optimizer state inside jit:
    param-like leaves pinned to ``moment_spec``, scalars replicated.
    Keeps ZeRO-sharded Adam moments sharded across train-step outputs (XLA
    would otherwise be free to replicate them)."""
    import optax

    def pin(leaf, spec):
        return jax.lax.with_sharding_constraint(
            leaf, NamedSharding(mesh, spec))

    return optax.tree_map_params(
        optimizer, pin, opt_state, moment_spec,
        transform_non_params=lambda leaf: pin(leaf, P()))


def shard_tree(mesh, tree, spec_tree=None):
    """Device-put a pytree with the given spec tree (replicated if None)."""
    if spec_tree is None:
        return jax.device_put(tree, NamedSharding(mesh, P()))
    flat = flatten_tree(tree)
    spec_flat = flatten_tree(spec_tree)
    placed = {
        path: jax.device_put(leaf, NamedSharding(mesh, spec_flat[path]))
        for path, leaf in flat.items()
    }
    return unflatten_tree(placed, like=tree)
