"""Codebook (SOM) training stage.

Parity with reference ``train_codebook.py:22-307``: Adam over the codebook
weights, loss = MSE(soft-quantized feature map, feature map) with the
Gaussian neighbourhood, neighbourhood range decremented every
``neighbourhood_step`` global steps, decoder-preview image grids and the
codebook checkpoint dict (incl. ``neighbourhood_range`` and
``global_steps``) at every checkpoint step.  TPU-native: BMU + soft
quantization + backward all fuse into one jitted step; the neighbourhood
range enters as a traced scalar so the schedule never recompiles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from qaig_tpu.data import FeatureMapDataset, DataLoader
from qaig_tpu.models.codebook import Codebook
from qaig_tpu.parallel import batch_sharding, shard_tree
from qaig_tpu.parallel.mesh import make_mesh_for_batch
from qaig_tpu.train import common, optim
from qaig_tpu.utils import save_model, load_model, save_images
from qaig_tpu.utils.checkpoint import wait_pending_saves
from qaig_tpu.utils.logging_utils import setup_logging

PROJECT_NAME = "Codebook"


def make_train_step(model, optimizer):
    def step(params, opt_state, batch, neighbourhood_range):
        def loss_fn(p):
            quant = model.apply(p, batch, use_gaussian=True,
                                neighbourhood_range=neighbourhood_range)
            return jnp.mean((quant - batch) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss
    return jax.jit(step, donate_argnums=(0, 1))


def checkpoint_dict(model, params, global_steps, opt_state=None):
    # "model_optimizer" is an extra key beyond the reference schema
    # (train_codebook.py:271-288 persists no optimizer state); the
    # reference's loader indexes only the keys it knows, so it round-trips
    # harmlessly.  --auto-resume reads it back.
    ckpt = {
        "patch_dim": tuple(model.patch_dim),
        "image_dim": tuple(model.image_dim),
        "image_C": model.image_channel,
        "num_embeddings": model.num_embeddings,
        "neighbourhood_range": model.neighbourhood_range,
        "global_steps": global_steps,
        "checkpoint": common.model_state_dict(params),
    }
    if opt_state is not None:
        ckpt["model_optimizer"] = common.gather_replicated(opt_state)
    return ckpt


def run(args):
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
    neighbourhood_step = config_dict["neighbourhood_step"]
    lr_update_step = args.get("lr_step", 100_000)
    checkpoint_step = args.get("checkpoint_step", 1_000)
    batch_size = args.get("batch_size", 8)
    max_epoch = args.get("max_epoch", 1_000)
    max_steps = args.get("max_steps")

    # Pre-trained decoder (eval-only previews).
    status, dec_ckpt = load_model(args["decoder_path"], logging=log.info)
    if not status:
        raise RuntimeError(
            "An error occured while loading decoder model checkpoint!")
    decoder, dec_params, _ = common.decoder_from_checkpoint(
        dec_ckpt, logging=log.info)
    decode = jax.jit(decoder.apply)

    global_steps = 0
    resume_opt = None
    # --auto-resume: continue from the newest codebook checkpoint in
    # out_dir.  Explicit --codebook-path wins.
    if args.get("auto_resume") and not args.get("codebook_path"):
        latest, _ = common.find_latest_checkpoint(out_dir,
                                                  prefix="codebook",
                                                  logging=log.info)
        if latest is None:
            log.info("Auto-resume: no checkpoint under "
                     f"{out_dir}/models_checkpoint; starting fresh.")
        else:
            args = dict(args, codebook_path=latest)
            log.info(f"Auto-resume: continuing from {latest}")
    if args.get("codebook_path"):
        status, cb_ckpt = load_model(args["codebook_path"], logging=log.info)
        if not status:
            raise RuntimeError(
                "An error occured while loading codebook checkpoint!")
        model, params = common.codebook_from_checkpoint(
            cb_ckpt, logging=log.info)
        global_steps = cb_ckpt.get("global_steps", 0)
        if args.get("auto_resume"):
            # the checkpoint at counter N already contains update N+1 (the
            # train step precedes the save); continue at N+1 rather than
            # replaying the boundary step.  Plain --codebook-path keeps the
            # reference's resume-at-N semantics
            # (/root/reference/train_codebook.py:167).
            resume_opt = cb_ckpt.get("model_optimizer")
            global_steps = global_steps + 1
            if global_steps % neighbourhood_step == 0:
                # the pre-crash run decreased the range right after this
                # save (loop bottom of the boundary iteration); replay it
                model.decrease_neighbourhood(steps=1)
            log.info(f"Resuming at global step {global_steps:,}.")
    else:
        model = Codebook(
            patch_dim=(config_dict["patch_H"], config_dict["patch_W"]),
            image_dim=(config_dict["image_H"], config_dict["image_W"]),
            image_channel=config_dict["image_C"],
            num_embeddings=config_dict["num_embeddings"],
            init_neighbour_range=config_dict["num_embeddings"] // 2)
        params = model.init(jax.random.PRNGKey(args.get("seed", 0)))

    optimizer = optim.make_adam(model_lr, lr_update_step)
    opt_state = optimizer.init(params)
    if resume_opt is not None:  # --auto-resume: Adam moments continue too
        try:
            opt_state = common.restore_opt_state(
                model, params, opt_state, resume_opt, logging=log.info)
        except Exception as e:
            log.info(f"Could not restore optimizer state: {e}")

    mesh = make_mesh_for_batch(batch_size,
                               n_model=int(args.get("num_model_shards") or 1))
    data_sharding = batch_sharding(mesh, ndim=4)
    params = shard_tree(mesh, params)
    opt_state = shard_tree(mesh, opt_state)
    dec_params = shard_tree(mesh, dec_params)  # previews consume mesh batches

    dataset = FeatureMapDataset(args["dataset_path"])
    loader = DataLoader(dataset, batch_size=batch_size,
                        seed=args.get("seed", 0),
                        process_index=jax.process_index(),
                        process_count=jax.process_count())

    train_step = make_train_step(model, optimizer)
    quantize = jax.jit(
        lambda p, x, r: model.apply(p, x, use_gaussian=True,
                                    neighbourhood_range=r))

    log.info(PROJECT_NAME)
    log.info(f"Output Dir: {out_dir}")
    log.info("#" * 100)
    log.info("Codebook Parameters.")
    log.info(f"Image dim: {model.image_dim}")
    log.info(f"Image channel: {model.image_channel:,}")
    log.info(f"Patch size: {model.patch_dim}")
    log.info(f"Num Embeddings: {model.num_embeddings:,}")
    log.info(f"Neighbourhood range: {model.neighbourhood_range:,}")
    log.info("#" * 100)
    log.info("Training Parameters.")
    log.info(f"Max Epoch: {max_epoch:,}")
    log.info(f"Batch Size: {batch_size:,}")
    log.info(f"Model LR Update size: {lr_update_step:,}")
    log.info(f"Model Checkpoint step: {checkpoint_step:,}")
    log.info("#" * 100)

    log_every = args.get("log_every", 1)
    throughput = common.ThroughputMeter(batch_size)
    stop = False
    for _ in range(max_epoch):
        iteration_count = 0
        total_recon_loss = 0.0
        loss_acc = jnp.zeros(())
        for index, feature_map in enumerate(loader):
            profiler.step(global_steps)
            batch = common.put_global_batch(data_sharding, feature_map)
            nrange = jnp.asarray(model.neighbourhood_range, jnp.float32)
            params, opt_state, loss = train_step(params, opt_state, batch,
                                                 nrange)
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
                quant = quantize(params, batch, nrange)
                gt_img = common.gather_replicated(decode(dec_params, batch))
                quant_img = common.gather_replicated(
                    decode(dec_params, quant))
                ckpt = checkpoint_dict(model, params, global_steps,
                                       opt_state=opt_state)
                if common.is_main_process():
                    save_images(np.asarray(gt_img),
                                f"image_plot_{global_steps}", out_dir,
                                logging=log.info)
                    save_images(np.asarray(quant_img),
                                f"quant_image_plot_{global_steps}", out_dir,
                                logging=log.info)
                    save_status = save_model(
                        ckpt, dest_path=out_dir,
                        backend=args.get("checkpoint_backend", "pickle"),
                        file_name=f"codebook_{global_steps}.pt",
                        logging=log.info)
                    log.info("Successfully saved codebook." if save_status
                             else "Error occured saving codebook.")
                    if save_status and args.get("keep_checkpoints"):
                        common.prune_checkpoints(
                            out_dir, int(args["keep_checkpoints"]),
                            prefix="codebook", logging=log.info,
                            backend=args.get("checkpoint_backend"))

            lr_now = optim.current_lr(model_lr, lr_update_step,
                                      global_steps + 1)
            if should_sync:
                avg = total_recon_loss / iteration_count
                log.info(
                    "Cum. Steps: {:,} | Steps: {:,} / {:,} | L.R.: {:.8f} | "
                    "Recon Loss: {:.5f} | Neighbourhood Range: {}".format(
                        global_steps + 1, index + 1, len(loader), lr_now,
                        avg, model.neighbourhood_range))
                metrics.log(step=global_steps + 1, lr=lr_now, recon_loss=avg,
                            samples_per_sec=throughput.rate(
                                global_steps + 1),
                            neighbourhood_range=model.neighbourhood_range)
            global_steps += 1
            if global_steps % neighbourhood_step == 0:
                model.decrease_neighbourhood(steps=1)
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
    return model, params
