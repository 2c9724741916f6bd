"""Shared training-stage plumbing: config load, platform selection, model
state save/restore dispatch."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from qaig_tpu.utils.checkpoint import flatten_tree, tolerant_restore
from qaig_tpu.utils import torch_compat


def load_config(path):
    with open(path, "r") as f:
        return json.load(f)


def _checkpoint_complete(path):
    """Cheap crash-completeness check for auto-resume candidates.  Pickle
    files are written atomically (tmp+rename), so a non-empty file is
    complete; ``.orbax`` directories are multi-file writes — require the
    arrays commit plus the ``meta.json`` sidecar (written last by
    ``save_model_orbax``) and no leftover tmp markers from an interrupted
    (a)sync commit."""
    p = str(path)
    if not p.endswith(".orbax"):
        return os.path.isfile(p) and os.path.getsize(p) > 0
    arrays = os.path.join(p, "arrays")
    if not (os.path.isdir(arrays)
            and os.path.isfile(os.path.join(p, "meta.json"))):
        return False
    return not any("tmp" in name.lower()
                   for name in os.listdir(p) + os.listdir(arrays))


def _list_checkpoints(out_dir, prefix):
    """All ``<prefix>_<N>.pt`` / ``.pt.orbax`` checkpoints under
    ``<out_dir>/models_checkpoint`` as ``(N, path)``, newest first.  The
    single source of the checkpoint naming contract — auto-resume discovery
    (``find_latest_checkpoint``) and retention (``prune_checkpoints``) must
    agree on it or pruning could skip (or eat) files resume sees."""
    import pathlib
    import re
    d = pathlib.Path(out_dir) / "models_checkpoint"
    if not d.is_dir():
        return []
    pat = re.compile(rf"{re.escape(prefix)}_(\d+)\.pt(\.orbax)?")
    return sorted(((int(m.group(1)), p) for p in d.iterdir()
                   if (m := pat.fullmatch(p.name))), reverse=True)


def find_latest_checkpoint(out_dir, prefix="model", logging=None):
    """Newest COMPLETE ``<prefix>_<N>.pt`` (or ``.pt.orbax`` directory)
    under ``<out_dir>/models_checkpoint``, by step number N.  Returns
    ``(path, N)`` or ``(None, -1)``.  Backs ``--auto-resume`` (fault
    recovery: restart the CLI with the same --out-dir and training picks
    up from the last save — no reference equivalent, the reference
    restarts step counting on every resume).  A checkpoint that a crash
    left half-written is skipped in favor of the previous good one."""
    for n, p in _list_checkpoints(out_dir, prefix):
        if _checkpoint_complete(p):
            return p, n
        if logging is not None:
            logging(f"Auto-resume: skipping incomplete checkpoint {p} "
                    "(interrupted write).")
    return None, -1


def cast_floats(tree, dtype):
    """Cast every float leaf of a pytree to ``dtype`` (mixed-precision
    compute casts; integer leaves untouched)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def select_platform(device, compiler_option_spec=None):
    """Map the CLI --device flag onto jax platforms.  'auto' keeps whatever
    the environment provides (TPU when present).  Also installs XLA
    compiler options from ``--compiler-options`` (the spec argument) and/or
    QAIG_COMPILER_OPTIONS — the per-compile channel is the only one that
    reaches the TPU compiler through a remote-backend relay; see
    qaig_tpu/utils/compiler_options.py."""
    from qaig_tpu.utils import compiler_options
    compiler_options.install_from_env()
    if compiler_option_spec:
        compiler_options.install(compiler_options.parse(
            str(compiler_option_spec)))
    if device in (None, "auto", "tpu", "cuda"):
        return
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")


def maybe_init_distributed(args):
    """--multihost: join a multi-host TPU slice (DCN coordination via
    ``jax.distributed.initialize``; intra-slice collectives ride ICI through
    the sharding annotations — SURVEY §2f comm-backend plan).  On TPU pods
    the coordinator is auto-detected; ``--coordinator-address
    --num-processes --process-id`` override it (also how the CPU-backend
    multihost tests run)."""
    if args.get("multihost"):
        kwargs = {}
        for key in ("coordinator_address", "num_processes", "process_id"):
            if args.get(key) is not None:
                kwargs[key] = args[key]
        jax.distributed.initialize(**kwargs)


def is_main_process():
    return jax.process_index() == 0


def put_global_batch(sharding, local_batch):
    """Place one GLOBAL batch on the mesh.  Single-process: a plain sharded
    device_put.  Multihost: every process contributes its contiguous slice
    of the global batch (see ``DataLoader(process_index=...)``) and the
    global array is assembled shard-wise — no cross-host batch traffic."""
    local_batch = np.asarray(local_batch)
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(local_batch), sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)


def single_writer_barrier(tag):
    """Join the cross-process barrier that single-writer stages (fmap,
    prune) use so every process returns only after process 0's writes are
    durable.  No-op single-process.  Writers should call this from a
    ``finally`` so a failing process 0 still releases the waiters (they
    proceed; downstream file checks surface the failure) instead of
    hanging them in the collective."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def prune_checkpoints(out_dir, keep, prefix="model", logging=None,
                      backend=None):
    """Retention policy backing ``--keep-checkpoints``: delete all but the
    ``keep`` newest ``<prefix>_<N>.pt`` / ``.pt.orbax`` checkpoints under
    ``<out_dir>/models_checkpoint``.  Call only after a successful save (the
    reference keeps every checkpoint; this is opt-in).  ``backend``:
    under ``orbax-async`` the newest save may still be committing, so one
    extra checkpoint is retained behind it."""
    if keep and backend == "orbax-async":
        keep = int(keep) + 1
    import shutil
    if not keep or keep < 1:
        return
    for _, p in _list_checkpoints(out_dir, prefix)[keep:]:
        try:
            shutil.rmtree(p) if p.is_dir() else p.unlink()
            if logging is not None:
                logging(f"Pruned old checkpoint {p.name} "
                        f"(--keep-checkpoints {keep}).")
        except OSError as e:
            if logging is not None:
                logging(f"Could not prune {p}: {e}")


def apply_debug_flags(args):
    """--debug-nans: jax-native equivalent of the reference's NaN guard,
    failing at the op that produced the NaN instead of at the loss check
    (SURVEY §5 aux-subsystems plan)."""
    if args.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)


def apply_compilation_cache(args):
    """--compilation-cache-dir: persist XLA compilations across process
    restarts (jax persistent cache).  First run compiles and writes; every
    later run with the same program shapes deserializes instead of
    recompiling — the cold-start killer for serving restarts and short CLI
    invocations.  No reference equivalent (torch eager has no compile
    step)."""
    path = args.get("compilation_cache_dir")
    if path:
        os.makedirs(str(path), exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # cache everything: the cascade's many small jitted segments all
        # contribute to cold-start latency
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


class ThroughputMeter:
    """samples/sec between metric syncs (the loss fetch at each sync point
    is a device barrier, so wall-clock deltas between syncs are honest).
    First call returns None (no prior sync to measure from)."""

    def __init__(self, batch_size, clock=None):
        import time
        self.batch_size = batch_size
        clock = clock or time.monotonic
        self.clock = clock
        self._last_step = None
        self._last_t = None

    def rate(self, step):
        now = self.clock()
        prev_step, prev_t = self._last_step, self._last_t
        self._last_step, self._last_t = step, now
        if prev_step is None or step <= prev_step or now <= prev_t:
            return None
        return round((step - prev_step) * self.batch_size / (now - prev_t),
                     2)


class MetricsLogger:
    """Append-only JSONL metrics stream (<out>/metrics.jsonl) — the
    machine-readable counterpart of the reference's per-step log lines
    (SURVEY §5 observability plan)."""

    def __init__(self, out_dir, enabled=True):
        import json
        self._json = json
        self.path = os.path.join(str(out_dir), "metrics.jsonl")
        self.enabled = enabled
        self._fh = open(self.path, "a") if enabled else None

    def log(self, **fields):
        if not self.enabled:
            return
        self._fh.write(self._json.dumps(fields) + "\n")
        self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


class Profiler:
    """Optional jax.profiler tracing over a window of train steps.

    ``--profile-dir d [--profile-start s --profile-steps n]`` captures steps
    [s, s+n) into a TensorBoard-loadable trace (the reference has no
    profiling at all; SURVEY §5).
    """

    def __init__(self, args):
        self.dir = args.get("profile_dir")
        self.start = args.get("profile_start", 5)
        self.steps = args.get("profile_steps", 5)
        self.active = False

    def step(self, global_step):
        if not self.dir:
            return
        if global_step == self.start and not self.active:
            jax.profiler.start_trace(str(self.dir))
            self.active = True
        elif self.active and global_step >= self.start + self.steps:
            jax.profiler.stop_trace()
            self.active = False

    def close(self):
        if self.active:
            jax.profiler.stop_trace()
            self.active = False


def model_state_dict(params):
    """Flat dotted-path numpy state (the checkpoint 'model' entry).  Under
    multihost (or TP) the leaves may be sharded across non-addressable
    devices; gather them to fully-replicated first."""
    params = gather_replicated(params)
    return {k: np.asarray(v) for k, v in flatten_tree(params).items()}


def gather_replicated(tree):
    """Return ``tree`` with every leaf fully replicated (host-readable)."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "sharding")]
    if not leaves:
        return tree
    if all(l.is_fully_replicated for l in leaves if hasattr(
            l, "is_fully_replicated")):
        return tree
    from jax.sharding import NamedSharding, PartitionSpec
    mesh = next(l.sharding.mesh for l in leaves
                if hasattr(l.sharding, "mesh"))
    replicated = NamedSharding(mesh, PartitionSpec())
    return jax.jit(lambda t: t,
                   out_shardings=jax.tree_util.tree_map(
                       lambda _: replicated, tree))(tree)


def looks_like_torch_state(state):
    return any(k.endswith(".weight") or k.endswith(".bias") or k == "weight"
               for k in state)


def restore_model_state(model, params, state, logging=print, key_map=None):
    """Tolerantly restore a checkpoint 'model' entry — either this
    framework's flat state or a reference torch state_dict.  ``key_map``
    applies only to the native flat-state path (torch states carry their own
    prefix rules in ``torch_compat``)."""
    if looks_like_torch_state(state):
        return torch_compat.load_torch_into(model, params, state,
                                            logging=logging)
    return tolerant_restore(params, state, logging=logging, key_map=key_map)


def restore_opt_state(model, params, opt_state, ckpt_opt, logging=print):
    """Restore a checkpoint's ``model_optimizer`` entry — either this
    framework's optax state or a reference torch Adam state dict
    (``/root/reference/train_autoencoder.py:139-150`` resume path).  Torch
    states are mapped onto the fresh optax state via the export mapping
    table (moments get the same layout transforms as the weights)."""
    from qaig_tpu.utils import torch_optim
    if torch_optim.is_torch_adam_state(ckpt_opt):
        return torch_optim.import_adam_state(model, params, opt_state,
                                             ckpt_opt, logging=logging)
    restored = jax.tree_util.tree_map(jnp.asarray, ckpt_opt)
    if (jax.tree_util.tree_structure(restored)
            == jax.tree_util.tree_structure(opt_state)):
        return restored  # pickle round-trip: optax namedtuples intact
    # structure mismatch (e.g. an .orbax checkpoint loads as shallow
    # dotted-path dicts): map the flat paths onto the fresh optax state
    return tolerant_restore(opt_state, flatten_tree(ckpt_opt),
                            logging=logging)


def submodule_key_map(keep_prefix, drop_prefixes=()):
    """Extract one submodule from a composite flat checkpoint: strip
    ``keep_prefix`` from matching paths, drop ``drop_prefixes`` paths, pass
    everything else through — the native equivalent of the reference's
    prefix-rewrite ``custom_load_state_dict`` hacks (``FC_Encoder.py:62-83``,
    ``FC_Decoder.py:68-91``)."""
    def key_map(name):
        if name.startswith(keep_prefix):
            return name[len(keep_prefix):]
        for drop in drop_prefixes:
            if name.startswith(drop):
                return None
        return name
    return key_map


def to_device_params(params):
    return jax.tree_util.tree_map(jnp.asarray, params)


def check_finite(loss, context="training"):
    if not np.isfinite(loss):
        raise FloatingPointError(f"NaN encountered during {context}.")


def ensure_dir(path):
    os.makedirs(str(path), exist_ok=True)
    return path


def decoder_from_checkpoint(ckpt, logging=print):
    """Rebuild the FC decoder from an autoencoder checkpoint dict (reference
    ``train_codebook.py:119-141`` / ``train_quantized_transformer.py:
    186-208`` pattern)."""
    from qaig_tpu.models.conv_nets import FCDecoder, ConvNetConfig
    cfg = ConvNetConfig(
        num_layers=ckpt["num_layers"],
        image_channel=ckpt["image_channel"],
        min_channel=ckpt["min_channel"],
        max_channel=ckpt["max_channel"],
        latent_channel=ckpt["latent_channel"],
        hidden_activation_type=ckpt["hidden_activation_type"],
        use_final_activation=ckpt["use_final_dec_activation"],
        final_activation_type=ckpt["decoder_activation_type"])
    model = FCDecoder(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params = restore_model_state(
        model, params, ckpt["model"], logging=logging,
        key_map=submodule_key_map("fc_decoder.",
                                  drop_prefixes=("fc_encoder.",)))
    return model, params, cfg


def autoencoder_from_checkpoint(ckpt, logging=print):
    """Rebuild the full Autoencoder from its (self-describing) checkpoint
    dict (reference ``train_autoencoder.py:108-150`` resume pattern)."""
    from qaig_tpu.models.conv_nets import Autoencoder, AutoencoderConfig
    cfg = AutoencoderConfig(
        num_layers=ckpt["num_layers"],
        image_channel=ckpt["image_channel"],
        min_channel=ckpt["min_channel"],
        max_channel=ckpt["max_channel"],
        latent_channel=ckpt["latent_channel"],
        hidden_activation_type=ckpt["hidden_activation_type"],
        use_final_enc_activation=ckpt["use_final_enc_activation"],
        encoder_activation_type=ckpt["encoder_activation_type"],
        use_final_dec_activation=ckpt["use_final_dec_activation"],
        decoder_activation_type=ckpt["decoder_activation_type"])
    model = Autoencoder(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params = restore_model_state(model, params, ckpt["model"],
                                 logging=logging)
    return model, params, cfg


def codebook_from_checkpoint(ckpt, logging=print):
    """Rebuild a codebook from its checkpoint dict (reference
    ``train_quantized_transformer.py:211-255`` pattern)."""
    from qaig_tpu.models.codebook import Codebook
    model = Codebook(
        patch_dim=tuple(ckpt["patch_dim"]),
        image_dim=tuple(ckpt["image_dim"]),
        image_channel=ckpt["image_C"],
        num_embeddings=ckpt["num_embeddings"],
        init_neighbour_range=ckpt["neighbourhood_range"])
    params = model.init(jax.random.PRNGKey(0))
    params = restore_model_state(model, params, ckpt["checkpoint"],
                                 logging=logging)
    return model, params
