"""Feature-map dataset generation stage.

Parity with reference ``generate_fmap_dataset.py:19-173``: run the (loaded)
FC encoder over the image dataset, write each latent as a raw ``.npy`` into
numbered folders of ``num_files_folder`` files, and emit a TinyDB-format
``all_dataset.json`` manifest with {fmap_path, image_path} rows.

Reference quirk preserved: the encoder's final-activation flag is read from
the checkpoint's ``use_final_dec_activation`` key
(``generate_fmap_dataset.py:136``).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from qaig_tpu.data import ImageDataset, DataLoader
from qaig_tpu.data.manifest import write_manifest
from qaig_tpu.models.conv_nets import FCEncoder, ConvNetConfig
from qaig_tpu.train import common
from qaig_tpu.utils import load_model

# Manifest filename contract (reference: generate_fmap_dataset.py writes
# "all_dataset.json").  Both the writer (save_feature_maps) and the
# multihost non-writer early return derive the returned path from this.
MANIFEST_NAME = "all_dataset.json"


def manifest_path_for(out_dir):
    return os.path.join(str(out_dir), MANIFEST_NAME)


def encoder_from_checkpoint(ckpt, logging=print):
    cfg = ConvNetConfig(
        num_layers=ckpt["num_layers"],
        image_channel=ckpt["image_channel"],
        min_channel=ckpt["min_channel"],
        max_channel=ckpt["max_channel"],
        latent_channel=ckpt["latent_channel"],
        hidden_activation_type=ckpt["hidden_activation_type"],
        # Reference quirk: dec flag gates the encoder's final activation here
        use_final_activation=ckpt["use_final_dec_activation"],
        final_activation_type=ckpt["encoder_activation_type"])
    model = FCEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params = common.restore_model_state(
        model, params, ckpt["model"], logging=logging,
        key_map=common.submodule_key_map("fc_encoder.",
                                         drop_prefixes=("fc_decoder.",)))
    return model, params, cfg


def save_feature_maps(model, params, loader, out_dir, num_files_folder=1_000,
                      logging=print, write_threads=8):
    encode = jax.jit(model.apply)
    file_index = 0
    folder_name = 0
    all_data = []

    # Path assignment (and therefore the manifest) stays strictly serial;
    # only the raw .npy writes fan out, overlapping disk IO with the next
    # batch's device encode.  In-flight writes are bounded by a semaphore so
    # a lagging disk applies backpressure instead of accumulating every
    # outstanding latent in memory.
    import threading
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=write_threads)
    in_flight = threading.BoundedSemaphore(4 * write_threads)
    pending = []

    def write_one(path, arr):
        try:
            with open(path, "wb") as f:
                np.save(f, arr, allow_pickle=False, fix_imports=False)
        finally:
            in_flight.release()

    logging("#" * 100)
    logging("Saving Feature Maps to disk...")
    for index, (image, image_paths) in enumerate(loader):
        latents = np.asarray(encode(params, jnp.asarray(image)))
        for fmap, image_path in zip(latents, image_paths):
            if file_index % num_files_folder == 0 and file_index > 0:
                folder_name += 1
            curr_folder = os.path.join(str(out_dir), str(folder_name))
            os.makedirs(curr_folder, exist_ok=True)
            fmap_path = os.path.join(curr_folder, str(file_index))
            in_flight.acquire()
            pending.append(pool.submit(write_one, fmap_path, fmap))
            file_index += 1
            all_data.append({"fmap_path": fmap_path,
                             "image_path": image_path})
        logging(f"{index + 1:,} / {len(loader):,}")
    for fut in pending:
        fut.result()  # surface write errors; all files durable past here
    pool.shutdown()
    logging("Finished saving feature maps.")

    manifest_path = manifest_path_for(out_dir)
    write_manifest(manifest_path, all_data)
    logging("Finished saving json file.")
    logging("#" * 100)
    return manifest_path


def run(args):
    common.select_platform(args.get("device"),
                           args.get("compiler_options"))
    common.apply_compilation_cache(args)
    common.maybe_init_distributed(args)
    out_dir = common.ensure_dir(args["out_dir"])

    # Single-writer stage: under --multihost only process 0 encodes and
    # writes (the stage is disk-bound and the manifest/.npy paths are one
    # namespace — concurrent writers would race on the same files); the
    # rest wait at a barrier so every process returns after the manifest
    # is durable.  The writer reaches the barrier from a finally so a
    # failure releases the waiters instead of hanging them.
    if jax.process_count() > 1 and jax.process_index() != 0:
        common.single_writer_barrier("qaig_fmap_done")
        return manifest_path_for(out_dir)

    try:
        status, ckpt = load_model(args["model_path"])
        if not status:
            raise RuntimeError(
                "An error occured while loading Encoder model checkpoint!")
        model, params, _ = encoder_from_checkpoint(ckpt)

        dataset = ImageDataset(args["dataset_path"], return_filepaths=True)
        loader = DataLoader(dataset, batch_size=args.get("batch_size", 8),
                            shuffle=True, seed=args.get("seed", 0),
                            drop_remainder=False)
        manifest_path = save_feature_maps(
            model, params, loader, out_dir,
            num_files_folder=args.get("num_files_folder", 1_000))
    finally:
        common.single_writer_barrier("qaig_fmap_done")
    return manifest_path
