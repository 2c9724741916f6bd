"""Autoencoder training stage.

Behavioral parity with reference ``train_autoencoder.py:23-283``: Adam(0.5,
0.999) MSE reconstruction training, LR halving every ``lr_step`` updates,
checkpoint + ground-truth/reconstruction image grids every
``checkpoint_step``, NaN guard, identical checkpoint dict schema and log
format.  TPU-native: the whole update (forward, loss, backward, Adam) is one
jitted function; batches stream through the prefetching loader and are
sharded over the mesh's data axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from qaig_tpu.data import ImageDataset, DataLoader
from qaig_tpu.models.conv_nets import Autoencoder, AutoencoderConfig
from qaig_tpu.parallel import batch_sharding, shard_tree
from qaig_tpu.parallel.mesh import make_mesh_for_batch
from qaig_tpu.train import common, optim
from qaig_tpu.utils import save_model, load_model, save_images
from qaig_tpu.utils.checkpoint import wait_pending_saves
from qaig_tpu.utils.logging_utils import setup_logging

PROJECT_NAME = "Autoencoder"


def build_autoencoder(config_dict):
    """Config parsing parity with ``train_autoencoder.py:108-130`` (incl.
    the fallback activation defaults)."""
    use_final_enc = config_dict["use_final_enc_activation"]
    use_final_dec = config_dict["use_final_dec_activation"]
    cfg = AutoencoderConfig(
        num_layers=config_dict["num_layers"],
        image_channel=config_dict["image_channel"],
        min_channel=config_dict["min_channel"],
        max_channel=config_dict["max_channel"],
        latent_channel=config_dict["latent_channel"],
        hidden_activation_type=config_dict["hidden_activation_type"],
        use_final_enc_activation=use_final_enc,
        encoder_activation_type=(
            config_dict["encoder_activation_type"] if use_final_enc
            else "silu"),
        use_final_dec_activation=use_final_dec,
        decoder_activation_type=(
            config_dict["decoder_activation_type"] if use_final_dec
            else "tanh"))
    return Autoencoder(cfg), cfg


def make_train_step(model, optimizer, bf16=False, grad_accum=1,
                    accum_mesh=None, zero_shards=None):
    """``bf16``: conv forward/backward in bfloat16, master weights /
    gradients / Adam moments / loss in float32 (opt-in mixed precision —
    the reference trains fp32-only).

    ``grad_accum``/``accum_mesh``/``zero_shards``: same contracts as the
    transformer stage (``train/transformer.py::make_train_step``) —
    ``lax.scan`` gradient accumulation over equal batch chunks, and
    ZeRO-1 moment sharding via ``(mesh, param_spec, moment_spec)``."""
    def step(params, opt_state, batch):
        def loss_fn(p, b):
            if bf16:
                p = common.cast_floats(p, jnp.bfloat16)
                recon = model.apply(p, b.astype(jnp.bfloat16))
                recon = recon.astype(jnp.float32)
            else:
                recon = model.apply(p, b)
            return jnp.mean((recon - b) ** 2)

        if grad_accum <= 1:
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        else:
            a = grad_accum
            chunks = batch.reshape((a, batch.shape[0] // a)
                                   + batch.shape[1:])
            if accum_mesh is not None:
                chunks = jax.lax.with_sharding_constraint(
                    chunks, jax.sharding.NamedSharding(
                        accum_mesh,
                        jax.sharding.PartitionSpec(None, "data")))

            def body(acc, b):
                l, g = jax.value_and_grad(loss_fn)(params, b)
                acc_l, acc_g = acc
                return (acc_l + l,
                        jax.tree_util.tree_map(jnp.add, acc_g, g)), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                body, (jnp.zeros(()), zeros), chunks)
            loss = loss_sum / a
            grads = jax.tree_util.tree_map(lambda g: g / a, grad_sum)

        if zero_shards is not None:
            z_mesh, z_param_spec, z_moment_spec = zero_shards

            def pin(tree, spec_tree):
                return jax.tree_util.tree_map(
                    lambda x, s: jax.lax.with_sharding_constraint(
                        x, jax.sharding.NamedSharding(z_mesh, s)),
                    tree, spec_tree)

            grads = pin(grads, z_moment_spec)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if zero_shards is not None:
            from qaig_tpu.parallel.sharding import constrain_opt_state
            params = pin(params, z_param_spec)
            opt_state = constrain_opt_state(optimizer, opt_state, z_mesh,
                                            z_moment_spec)
        return params, opt_state, loss
    return jax.jit(step, donate_argnums=(0, 1))


def checkpoint_dict(cfg, params, opt_state, global_steps=0):
    # "global_steps" is an extra key beyond the reference schema
    # (train_autoencoder.py:235-247 persists no step counter); the
    # reference's loader indexes only the keys it knows, so it round-trips
    # harmlessly.  --auto-resume reads it back.
    return {
        "global_steps": global_steps,
        "num_layers": cfg.num_layers,
        "image_channel": cfg.image_channel,
        "min_channel": cfg.min_channel,
        "max_channel": cfg.max_channel,
        "latent_channel": cfg.latent_channel,
        "hidden_activation_type": cfg.hidden_activation_type,
        "use_final_enc_activation": cfg.use_final_enc_activation,
        "encoder_activation_type": cfg.encoder_activation_type,
        "use_final_dec_activation": cfg.use_final_dec_activation,
        "decoder_activation_type": cfg.decoder_activation_type,
        "model": common.model_state_dict(params),
        "model_optimizer": opt_state,
    }


def run(args):
    """``args`` mirrors the reference CLI flags (dict)."""
    common.select_platform(args.get("device"),
                           args.get("compiler_options"))
    common.maybe_init_distributed(args)
    common.apply_debug_flags(args)
    common.apply_compilation_cache(args)
    out_dir = common.ensure_dir(args["out_dir"])
    log = setup_logging(out_dir, PROJECT_NAME,
                        main_process=common.is_main_process())
    profiler = common.Profiler(args)
    metrics = common.MetricsLogger(out_dir,
                                   enabled=common.is_main_process())

    config_dict = common.load_config(args["config_path"])
    model_lr = config_dict["model_lr"]
    lr_update_step = args.get("lr_step", 50_000)
    checkpoint_step = args.get("checkpoint_step", 1_000)
    batch_size = args.get("batch_size", 8)
    max_epoch = args.get("max_epoch", 1_000)
    max_steps = args.get("max_steps")  # optional extension for smoke runs

    model, cfg = build_autoencoder(config_dict)
    params = model.init(jax.random.PRNGKey(args.get("seed", 0)))

    optimizer = optim.make_adam(model_lr, lr_update_step)
    opt_state = optimizer.init(params)

    # --auto-resume: continue from the newest checkpoint in out_dir
    # (model + optimizer + step counter).  Explicit --model-path wins.
    resume_steps = None
    if args.get("auto_resume") and not args.get("model_path"):
        latest, latest_n = common.find_latest_checkpoint(out_dir,
                                                         logging=log.info)
        if latest is None:
            log.info("Auto-resume: no checkpoint under "
                     f"{out_dir}/models_checkpoint; starting fresh.")
        else:
            args = dict(args, model_path=latest, load_optim=True)
            resume_steps = latest_n
            log.info(f"Auto-resume: continuing from {latest}")

    if args.get("model_path"):
        status, ckpt = load_model(args["model_path"], logging=log.info)
        if not status:
            raise RuntimeError(
                "An error occured while loading model checkpoint!")
        params = common.restore_model_state(model, params, ckpt["model"],
                                            logging=log.info)
        if args.get("auto_resume"):
            resume_steps = int(ckpt.get("global_steps", resume_steps or 0))
        if args.get("load_optim") and "model_optimizer" in ckpt:
            try:
                opt_state = common.restore_opt_state(
                    model, params, opt_state, ckpt["model_optimizer"],
                    logging=log.info)
            except Exception as e:
                log.info(f"Could not restore optimizer state: {e}")

    raw_accum = args.get("grad_accum")
    grad_accum = 1 if raw_accum is None else int(raw_accum)
    if grad_accum < 1:
        raise ValueError(f"--grad-accum must be >= 1, got {grad_accum}")
    if batch_size % grad_accum:
        raise ValueError(
            f"batch size {batch_size} not divisible by "
            f"--grad-accum {grad_accum}")

    # Conv nets carry no tensor-parallel spec; --num-model-shards still
    # shapes the mesh (data axis shrinks) so mixed-stage pipelines can run
    # every stage on the same mesh geometry.  --grad-accum: the mesh only
    # ever sees one chunk at a time.
    mesh = make_mesh_for_batch(batch_size // grad_accum,
                               n_model=int(args.get("num_model_shards") or 1))
    data_sharding = batch_sharding(mesh, ndim=4)
    # ZeRO-1 (--zero-opt): Adam moments sharded over 'data' (conv params
    # themselves stay replicated — there is no conv TP spec).
    moment_spec = None
    if args.get("zero_opt"):
        from jax.sharding import PartitionSpec as P
        from qaig_tpu.parallel.sharding import (shard_opt_state,
                                                zero_opt_spec)
        param_spec = jax.tree_util.tree_map(lambda _: P(), params)
        moment_spec = zero_opt_spec(params, param_spec,
                                    mesh.shape["data"])
        params = shard_tree(mesh, params)
        opt_state = shard_opt_state(mesh, optimizer, opt_state, param_spec,
                                    moment_spec=moment_spec)
        zero_shards = (mesh, param_spec, moment_spec)
    else:
        params = shard_tree(mesh, params)
        opt_state = shard_tree(mesh, opt_state)
        zero_shards = None

    dataset = ImageDataset(args["dataset_path"])
    loader = DataLoader(dataset, batch_size=batch_size,
                        seed=args.get("seed", 0),
                        process_index=jax.process_index(),
                        process_count=jax.process_count())

    train_step = make_train_step(model, optimizer,
                                 bf16=bool(args.get("bf16")),
                                 grad_accum=grad_accum,
                                 accum_mesh=(mesh if grad_accum > 1
                                             else None),
                                 zero_shards=zero_shards)

    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    log.info(PROJECT_NAME)
    log.info(f"Output Dir: {out_dir}")
    log.info(f"Model size: {n_params:,}")
    log.info("#" * 100)
    log.info("Autoencoder Parameters.")
    log.info(f"Num Layers: {cfg.num_layers:,}")
    log.info(f"Image Channel: {cfg.image_channel:,}")
    log.info(f"Min Channel: {cfg.min_channel:,}")
    log.info(f"Max Channel: {cfg.max_channel:,}")
    log.info(f"Latent Channel: {cfg.latent_channel:,}")
    log.info(f"Hidden activation type: {cfg.hidden_activation_type}")
    log.info("#" * 100)
    log.info("Training Parameters.")
    log.info("Mesh: data={} x model={}{}{}".format(
        mesh.shape["data"], mesh.shape["model"],
        " | ZeRO-1 optimizer sharding" if moment_spec is not None else "",
        f" | grad-accum {grad_accum}" if grad_accum > 1 else ""))
    log.info(f"Max Epoch: {max_epoch:,}")
    log.info(f"Batch Size: {batch_size:,}")
    log.info(f"Model LR Update size: {lr_update_step:,}")
    log.info(f"Model Checkpoint step: {checkpoint_step:,}")
    log.info("#" * 100)

    log_every = args.get("log_every", 1)
    throughput = common.ThroughputMeter(batch_size)
    # A checkpoint saved at counter N already contains update N+1 (the
    # train step precedes the save in the loop); resume continues at N+1
    # so a preempted run applies exactly the updates an uninterrupted one
    # would — no boundary-step replay.
    global_steps = 0 if resume_steps is None else resume_steps + 1
    if resume_steps is not None:
        log.info(f"Resuming at global step {global_steps:,}.")
    stop = False
    for _ in range(max_epoch):
        total_recon_loss = 0.0
        iteration_count = 0
        loss_acc = jnp.zeros(())
        for index, image in enumerate(loader):
            profiler.step(global_steps)
            batch = common.put_global_batch(data_sharding, image)
            params, opt_state, loss = train_step(params, opt_state, batch)
            iteration_count += 1
            loss_acc = loss_acc + loss
            should_sync = (log_every <= 1
                           or (global_steps + 1) % log_every == 0
                           or global_steps % checkpoint_step == 0)
            if should_sync:
                total_recon_loss = float(loss_acc)
                common.check_finite(total_recon_loss)

            if global_steps % checkpoint_step == 0:
                # every process joins the gathers (SPMD); only the main
                # process touches the filesystem
                ckpt = checkpoint_dict(cfg, params, opt_state,
                                       global_steps=global_steps)
                recon = common.gather_replicated(model.apply(params, batch))
                gt = common.gather_replicated(batch)
                if common.is_main_process():
                    save_status = save_model(
                        ckpt, dest_path=out_dir,
                        backend=args.get("checkpoint_backend", "pickle"),
                        file_name=f"model_{global_steps}.pt",
                        logging=log.info)
                    log.info("Successfully saved model." if save_status
                             else "Error occured saving model.")
                    if save_status and args.get("keep_checkpoints"):
                        common.prune_checkpoints(
                            out_dir, int(args["keep_checkpoints"]),
                            logging=log.info,
                            backend=args.get("checkpoint_backend"))
                    save_images(np.asarray(gt),
                                f"ground_truth_{global_steps}", out_dir,
                                logging=log.info)
                    save_images(np.asarray(recon), f"recon_{global_steps}",
                                out_dir, logging=log.info)

            lr_now = optim.current_lr(model_lr, lr_update_step,
                                      global_steps + 1)
            if should_sync:
                avg = total_recon_loss / iteration_count
                log.info(
                    "Cum. Steps: {:,} | Steps: {:,} / {:,} | L.R.: {:.8f} | "
                    "Recon Loss: {:.5f}".format(
                        global_steps + 1, index + 1, len(loader), lr_now,
                        avg))
                metrics.log(step=global_steps + 1, lr=lr_now,
                            recon_loss=avg,
                            samples_per_sec=throughput.rate(
                                global_steps + 1))
            global_steps += 1
            if max_steps and global_steps >= max_steps:
                stop = True
                break
        if stop:
            break
    profiler.close()
    metrics.close()
    if not wait_pending_saves(logging=log.info):  # join async write
        raise RuntimeError(
            "An error occured while saving model checkpoint!")
    return params, opt_state
