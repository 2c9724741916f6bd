"""Torch Adam optimizer-state conversion (both directions).

The reference resumes Adam moments from its checkpoints via
``model_optim.load_state_dict(model_dict["model_optimizer"])``
(``/root/reference/train_autoencoder.py:139-150``,
``train_quantized_transformer.py:329-330``).  Its state dict is
``{"state": {param_idx: {"step", "exp_avg", "exp_avg_sq"}},
"param_groups": [...]}`` with ``param_idx`` following
``model.parameters()`` registration order — the same order as the
name/layout mapping table in :mod:`qaig_tpu.utils.torch_export`, whose
per-parameter layout transforms (transpose / OIHW / flip) apply identically
to the moment tensors.

Import (:func:`import_adam_state`): torch dict -> this framework's optax
``adam`` state.  The Adam ``count`` (bias correction) continues from the
torch ``step``; the LR-schedule count restarts at 0, matching the
reference's force-reset of the learning rate from config on resume
(``train_autoencoder.py:148-150``).

Export (:func:`export_adam_state`): optax state -> a torch-loadable Adam
state dict, so training started here can resume under the reference.
"""

import numpy as np

from qaig_tpu.utils.checkpoint import flatten_tree, unflatten_tree
from qaig_tpu.utils.torch_export import (mapping_for_model, to_torch_layout,
                                         from_torch_layout)


def is_torch_adam_state(obj):
    return isinstance(obj, dict) and "param_groups" in obj and "state" in obj


def _moment_trees(model, params, torch_state, logging=print):
    """torch per-index moments -> (mu_flat, nu_flat, step) keyed by our
    dotted param paths, layouts converted."""
    mapping = mapping_for_model(model)
    state = {int(k): v for k, v in torch_state.items()}
    mu, nu = {}, {}
    steps = set()
    for idx, (ours, theirs, kind) in enumerate(mapping):
        entry = state.get(idx)
        if entry is None:
            logging(f"No optimizer state for param {idx} ({theirs}), "
                    "keeping zeros")
            continue
        mu[ours] = from_torch_layout(entry["exp_avg"], kind)
        nu[ours] = from_torch_layout(entry["exp_avg_sq"], kind)
        steps.add(int(np.asarray(entry["step"]).item()))
    if len(steps) > 1:
        logging(f"Torch Adam steps differ across params ({sorted(steps)}); "
                "using max")
    return mu, nu, (max(steps) if steps else 0)


def _map_adam_nodes(opt_state, fn):
    """Rebuild ``opt_state`` applying ``fn`` to every ScaleByAdamState-like
    node (has ``mu``/``nu``/``count`` fields)."""
    if hasattr(opt_state, "_fields"):
        if {"mu", "nu", "count"} <= set(opt_state._fields):
            return fn(opt_state)
        return type(opt_state)(*(_map_adam_nodes(v, fn) for v in opt_state))
    if isinstance(opt_state, tuple):
        return tuple(_map_adam_nodes(v, fn) for v in opt_state)
    if isinstance(opt_state, list):
        return [_map_adam_nodes(v, fn) for v in opt_state]
    return opt_state


def import_adam_state(model, params, opt_state, torch_opt, logging=print):
    """Map a reference torch Adam state dict onto a freshly-initialized
    optax ``adam`` state for the same ``params``.

    Tolerant like the weight path: params without torch state keep their
    zero moments.  Returns the new opt_state.
    """
    import jax.numpy as jnp

    mu_flat, nu_flat, step = _moment_trees(
        model, params, torch_opt.get("state", {}), logging=logging)

    def fill(template, flat_src):
        cur = flatten_tree(template)
        out = dict(cur)
        for path, value in flat_src.items():
            if path not in cur:
                logging(f"No optimizer slot for {path}, skipping")
                continue
            if tuple(cur[path].shape) != tuple(value.shape):
                logging(f"Optimizer shape mismatch at {path}, skipping")
                continue
            out[path] = jnp.asarray(value)
        return unflatten_tree(out, like=template)

    def replace(node):
        return type(node)(
            count=jnp.asarray(step, jnp.int32),
            mu=fill(node.mu, mu_flat),
            nu=fill(node.nu, nu_flat))

    return _map_adam_nodes(opt_state, replace)


def _find_adam_node(opt_state):
    found = []

    def visit(node):
        if hasattr(node, "_fields") and \
                {"mu", "nu", "count"} <= set(node._fields):
            found.append(node)
            return node
        return node
    _map_adam_nodes(opt_state, visit)
    if not found:
        raise ValueError("No Adam state found in optimizer state")
    return found[0]


def export_adam_state(model, opt_state, learning_rate=None,
                      betas=(0.5, 0.999), eps=1e-8):
    """optax ``adam`` state -> a torch ``Adam.state_dict()``-shaped dict the
    reference can ``load_state_dict`` (one param group, params indexed in
    ``model.parameters()`` order)."""
    import torch

    node = _find_adam_node(opt_state)
    mu_flat = flatten_tree(node.mu)
    nu_flat = flatten_tree(node.nu)
    step = int(np.asarray(node.count))
    mapping = mapping_for_model(model)
    state = {}
    for idx, (ours, theirs, kind) in enumerate(mapping):
        if ours not in mu_flat:
            raise KeyError(f"export: optimizer slot {ours!r} missing "
                           f"(wanted for torch param {idx} / {theirs!r})")
        state[idx] = {
            "step": torch.tensor(float(step)),
            "exp_avg": torch.from_numpy(to_torch_layout(mu_flat[ours], kind)),
            "exp_avg_sq": torch.from_numpy(
                to_torch_layout(nu_flat[ours], kind)),
        }
    group = {
        "lr": float(learning_rate) if learning_rate is not None else 1e-4,
        "betas": tuple(betas),
        "eps": float(eps),
        "weight_decay": 0,
        "amsgrad": False,
        "maximize": False,
        "foreach": None,
        "capturable": False,
        "differentiable": False,
        "fused": None,
        "params": list(range(len(mapping))),
    }
    return {"state": state, "param_groups": [group]}
