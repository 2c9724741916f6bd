"""Checkpoint persistence + tolerant restore.

Contract parity with reference ``utils/model_utils.py:6-52``: checkpoints are
a plain dict {hyperparams..., "model": state, "model_optimizer": opt state}
written under ``<out>/models_checkpoint/<name>``; ``load_model`` returns
``(status, dict)``.  Differences, by design:

* arrays are stored as numpy inside a pickle (no torch dependency); writes
  are atomic (tmp + rename) — the reference's torch.save could leave a
  truncated file on crash,
* ``load_model`` transparently reads **reference torch checkpoints** too
  (``.pt`` zip archives) when torch is importable, converting tensors to
  numpy — this is how pretrained reference weights enter the framework,
* tolerant restore (the reference's five ``custom_load_state_dict`` copies,
  e.g. ``models/Autoencoder.py:45-61``) is one generic function over flat
  '.'-joined key paths with optional key-rewrite rules.
"""

import os
import pickle

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# (de)serialization
# ---------------------------------------------------------------------------

def _to_numpy(obj):
    if isinstance(obj, dict):
        return {k: _to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # NamedTuple
        return type(obj)(*(_to_numpy(v) for v in obj))
    if isinstance(obj, (list, tuple)):
        converted = [_to_numpy(v) for v in obj]
        return tuple(converted) if isinstance(obj, tuple) else converted
    if isinstance(obj, jnp.ndarray):
        return np.asarray(obj)
    return obj


_pending_async_saves = []


def wait_pending_saves(logging=print):
    """Block until every outstanding ``orbax-async`` checkpoint write has
    committed to disk.  Called automatically before the next async save (at
    most one write is ever in flight) and by the training CLIs at exit."""
    ok = True
    while _pending_async_saves:
        ckptr = _pending_async_saves.pop()
        try:
            ckptr.wait_until_finished()
        except Exception as e:
            logging(f"Async checkpoint save failed: {e}.")
            ok = False
    return ok


def save_model(model_dict, dest_path, file_name, logging=print,
               backend="pickle"):
    """Atomically pickle ``model_dict`` to <dest>/models_checkpoint/<name>.

    ``backend="orbax"`` writes a sharded ``<name>.orbax/`` directory
    instead (no host gather for mesh-sharded params; see
    :func:`save_model_orbax`).  ``backend="orbax-async"`` additionally
    overlaps the write with training: the device->host snapshot happens
    before returning, the disk commit runs in the background, and the next
    save (or :func:`wait_pending_saves` at exit) joins it."""
    if backend == "orbax":
        return bool(save_model_orbax(model_dict, dest_path, file_name,
                                     logging=logging))
    if backend == "orbax-async":
        wait_pending_saves(logging=logging)  # at most one write in flight
        ckptr = save_model_orbax(model_dict, dest_path, file_name,
                                 logging=logging, async_save=True)
        if ckptr is False:
            return False
        _pending_async_saves.append(ckptr)
        return True
    try:
        folder = os.path.join(str(dest_path), "models_checkpoint")
        os.makedirs(folder, exist_ok=True)
        path = os.path.join(folder, file_name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(_to_numpy(model_dict), f, protocol=4)
        os.replace(tmp, path)
        return True
    except Exception as e:  # mirror the reference's boolean contract
        logging(f"Exception occured while saving model: {e}.")
        return False


def _torch_to_numpy(obj):
    import torch
    if isinstance(obj, dict):
        return {k: _torch_to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        converted = [_torch_to_numpy(v) for v in obj]
        return type(obj)(converted) if isinstance(obj, tuple) else converted
    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    return obj


def load_model(checkpoint_path, logging=print):
    """Load a checkpoint; returns (status, dict).  Understands the native
    pickle format, reference torch ``.pt`` files, and ``.orbax``
    directories."""
    if str(checkpoint_path).endswith(".orbax") and \
            os.path.isdir(str(checkpoint_path)):
        return load_model_orbax(checkpoint_path, logging=logging)
    checkpoint_path = str(checkpoint_path)
    if not os.path.exists(checkpoint_path):
        logging("Checkpoint does not exist.")
        return False, None
    if os.path.isdir(checkpoint_path):
        return load_model_orbax(checkpoint_path, logging=logging)
    try:
        with open(checkpoint_path, "rb") as f:
            head = f.read(4)
        if head[:2] == b"PK":  # torch zip archive
            import torch
            state = torch.load(checkpoint_path, map_location="cpu",
                               weights_only=False)
            return True, _torch_to_numpy(state)
        with open(checkpoint_path, "rb") as f:
            return True, pickle.load(f)
    except Exception as e:
        logging(f"Failed to load checkpoint {checkpoint_path}: {e}")
        return False, None


# ---------------------------------------------------------------------------
# orbax backend (optional)
# ---------------------------------------------------------------------------

def save_model_orbax(model_dict, dest_path, file_name, logging=print,
                     async_save=False):
    """Same checkpoint schema through orbax: arrays go into an orbax pytree
    directory, non-array metadata into a sidecar JSON.  Produces
    ``<dest>/models_checkpoint/<file_name>.orbax/``.

    Sharded leaves (``jax.Array`` on a mesh) are saved SHARD-WISE — every
    host/device writes its own shards, nothing is gathered through host
    memory (the pickle backend gathers; this one scales).  ``async_save``
    returns an ``ocp.AsyncCheckpointer`` whose ``wait_until_finished()``
    completes the write in the background while training continues.
    """
    import json
    try:
        import jax
        import orbax.checkpoint as ocp
        # orbax requires absolute checkpoint paths
        folder = os.path.abspath(os.path.join(
            str(dest_path), "models_checkpoint", str(file_name) + ".orbax"))
        flat = flatten_tree(model_dict)
        arrays, meta = {}, {}
        for k, v in flat.items():
            if isinstance(v, jax.Array):
                arrays[k] = v          # saved shard-wise, no host gather
            else:
                v = _to_numpy({"x": v})["x"]
                if isinstance(v, np.ndarray):
                    arrays[k] = v
                else:
                    meta[k] = v
        if os.path.exists(folder):
            import shutil
            shutil.rmtree(folder)
        os.makedirs(os.path.dirname(folder), exist_ok=True)
        if async_save:
            ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        else:
            ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(folder, "arrays"), arrays)
        with open(os.path.join(folder, "meta.json"), "w") as f:
            json.dump(meta, f, default=str)
        return ckptr if async_save else True
    except Exception as e:
        logging(f"Exception occured while saving model (orbax): {e}.")
        return False


def restore_arrays_orbax(path, sharding_flat=None, logging=print):
    """Restore the array entries of an ``.orbax`` checkpoint directly onto
    device shardings: ``sharding_flat`` maps dotted paths to
    ``jax.sharding.Sharding``; matching leaves are materialized shard-wise
    on their devices (no host-global copy).  Unlisted leaves restore as
    host numpy.  Returns (status, flat dict)."""
    try:
        import jax
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        item = os.path.join(os.path.abspath(str(path)), "arrays")
        meta = ckptr.metadata(item)
        meta = dict(getattr(meta, "item_metadata", meta).items())
        restore_args = {}
        for key, m in meta.items():
            sharding = (sharding_flat or {}).get(key)
            if sharding is not None:
                restore_args[key] = ocp.ArrayRestoreArgs(
                    sharding=sharding, global_shape=tuple(m.shape),
                    dtype=m.dtype)
            else:
                restore_args[key] = ocp.RestoreArgs()
        arrays = ckptr.restore(item, restore_args=restore_args)
        return True, arrays
    except Exception as e:
        logging(f"Failed to restore orbax arrays from {path}: {e}")
        return False, None


def load_model_orbax(path, logging=print):
    """Load an ``.orbax`` checkpoint directory back into the flat-dict
    checkpoint schema; returns (status, dict of dotted paths)."""
    import json
    try:
        import orbax.checkpoint as ocp
        path = os.path.abspath(str(path))
        ckptr = ocp.PyTreeCheckpointer()
        arrays = ckptr.restore(os.path.join(path, "arrays"))
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        flat = dict(arrays)
        flat.update(meta)
        # rebuild one nesting level: the schema dicts are shallow except for
        # the 'model'/'checkpoint' state and optimizer trees, which callers
        # consume through tolerant_restore on flat keys anyway.
        out = {}
        for key, value in flat.items():
            head, _, rest = key.partition(".")
            if not rest:
                out[key] = value
            else:
                out.setdefault(head, {})[rest] = value
        return True, out
    except Exception as e:
        logging(f"Failed to load orbax checkpoint {path}: {e}")
        return False, None


# ---------------------------------------------------------------------------
# flat-key pytree views
# ---------------------------------------------------------------------------

def flatten_tree(tree, prefix=""):
    """Nested dict/list pytree -> {dotted.path: leaf}."""
    flat = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix: tree}
    for key, value in items:
        path = f"{prefix}.{key}" if prefix else str(key)
        flat.update(flatten_tree(value, path))
    return flat


def tolerant_restore(target_tree, source_flat, key_map=None, logging=print,
                     ignore_msgs=False):
    """Copy leaves from ``source_flat`` (dotted-path dict) into a copy of
    ``target_tree`` wherever the path exists and shapes match; skip (and
    optionally report) everything else.  ``key_map`` is a callable applied to
    each source key first (the reference's prefix-rewrite hacks)."""
    target_flat = flatten_tree(target_tree)
    restored = dict(target_flat)
    for name, value in source_flat.items():
        if key_map is not None:
            name = key_map(name)
            if name is None:
                continue
        if name not in target_flat:
            if not ignore_msgs:
                logging(f"No Layer found: {name}, skipping")
            continue
        current = target_flat[name]
        if hasattr(current, "shape") and hasattr(value, "shape") \
                and tuple(current.shape) != tuple(value.shape):
            if not ignore_msgs:
                logging(f"Skipped: {name}")
            continue
        restored[name] = jnp.asarray(value)
    return unflatten_tree(restored, like=target_tree)


def unflatten_tree(flat, like):
    """Rebuild a pytree with the structure of ``like`` from dotted paths."""
    def build(node, prefix):
        if isinstance(node, dict):
            return {k: build(v, f"{prefix}.{k}" if prefix else str(k))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            rebuilt = [build(v, f"{prefix}.{i}" if prefix else str(i))
                       for i, v in enumerate(node)]
            if isinstance(node, list):
                return rebuilt
            if hasattr(node, "_fields"):  # namedtuple (optax states)
                return type(node)(*rebuilt)
            return tuple(rebuilt)
        return flat[prefix]
    return build(like, "")
