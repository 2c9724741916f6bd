"""Codebook pruning stage.

Parity with reference ``prune_codebook.py:21-185``: count BMU usage over the
full feature-map dataset, keep codes used >= ``prune_threshold`` times, copy
surviving rows into a smaller codebook, save as ``pruned_codebook.pt``.
TPU-native: the histogram is a device-side ``jnp.bincount`` accumulated per
batch (the reference walks a Python dict per token,
``prune_codebook.py:129-142``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from qaig_tpu.data import FeatureMapDataset, DataLoader
from qaig_tpu.models.codebook import Codebook
from qaig_tpu.train import common
from qaig_tpu.train.codebook import checkpoint_dict
from qaig_tpu.utils import save_model, load_model
from qaig_tpu.utils.checkpoint import wait_pending_saves
from qaig_tpu.utils.logging_utils import setup_logging

PROJECT_NAME = "Prune Codebook"


def usage_histogram(model, params, loader):
    """Device-side BMU usage counts over the whole dataset."""
    k = model.num_embeddings

    @jax.jit
    def batch_counts(p, batch):
        bmu = model.get_patches_bmu(p, batch)
        return jnp.bincount(bmu, length=k)

    counts = np.zeros(k, np.int64)
    for feature_map in loader:
        counts += np.asarray(batch_counts(params, jnp.asarray(feature_map)))
    return counts


def prune(model, params, counts, prune_threshold, logging=print):
    keep = np.nonzero(counts >= prune_threshold)[0]
    for i, count in enumerate(counts):
        logging(f"{i}: {count:,}")  # reference prune_codebook.py:144-149
    logging(f"Saved embeddings: {len(keep)}")

    new_model = Codebook(
        patch_dim=model.patch_dim,
        image_dim=model.image_dim,
        image_channel=model.image_channel,
        num_embeddings=len(keep),
        init_neighbour_range=model.neighbourhood_range)
    new_params = {"codebook": jnp.asarray(
        np.asarray(params["codebook"])[keep])}
    return new_model, new_params


def run(args):
    common.select_platform(args.get("device"),
                           args.get("compiler_options"))
    common.apply_compilation_cache(args)
    common.maybe_init_distributed(args)
    out_dir = common.ensure_dir(args["out_dir"])

    # Single-writer stage (like fmap generation): under --multihost only
    # process 0 computes the histogram and writes pruned_codebook.pt; the
    # writer hits the barrier via try/finally so a failure releases the
    # waiters instead of hanging them.
    if jax.process_count() > 1 and jax.process_index() != 0:
        common.single_writer_barrier("qaig_prune_done")
        return None, None

    try:
        return _run_writer(args, out_dir)
    finally:
        common.single_writer_barrier("qaig_prune_done")


def _run_writer(args, out_dir):
    log = setup_logging(out_dir, PROJECT_NAME)

    status, cb_ckpt = load_model(args["codebook_path"], logging=log.info)
    if not status:
        raise RuntimeError(
            "An error occured while loading codebook checkpoint!")
    model, params = common.codebook_from_checkpoint(cb_ckpt, logging=log.info)
    global_steps = cb_ckpt.get("global_steps", 0)

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

    dataset = FeatureMapDataset(args["dataset_path"])
    loader = DataLoader(dataset, batch_size=args.get("batch_size", 8),
                        shuffle=True, seed=args.get("seed", 0),
                        drop_remainder=False)

    counts = usage_histogram(model, params, loader)
    new_model, new_params = prune(model, params, counts,
                                  args.get("prune_threshold", 10),
                                  logging=log.info)

    save_status = save_model(
        checkpoint_dict(new_model, new_params, global_steps),
        dest_path=out_dir,
        file_name="pruned_codebook.pt",
        backend=args.get("checkpoint_backend", "pickle"),
        logging=log.info)
    log.info("Successfully saved codebook." if save_status
             else "Error occured saving codebook.")
    if not wait_pending_saves(logging=log.info):  # join async write
        raise RuntimeError(
            "An error occured while saving model checkpoint!")
    return new_model, new_params
