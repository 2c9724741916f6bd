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


def shard_opt_state(mesh, optimizer, opt_state, param_spec):
    """Place optimizer state on the mesh with param-like leaves (Adam mu/nu)
    sharded exactly like their parameters and everything else (step counts)
    replicated — so TP training never gathers first/second moments."""
    import optax

    def place(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return optax.tree_map_params(
        optimizer, place, opt_state, param_spec,
        transform_non_params=lambda leaf: place(leaf, P()))


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
