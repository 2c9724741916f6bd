"""Multihost data plane: process-sharded loading + global batch assembly.

The 2-process test runs the REAL ``train_quantized_transformer.py`` CLI in
two coordinated subprocesses on the CPU backend (``jax.distributed`` over
localhost) — the same code path a TPU pod drives, minus the hardware.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from qaig_tpu.data.loader import DataLoader
from qaig_tpu.data.manifest import write_manifest


class _Range:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2, 4, 4), float(i), np.float32)


def _free_port():
    """OS-assigned port for jax.distributed coordination (hardcoded ports
    collide across concurrent test runs on one machine)."""
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_dataloader_process_slices_are_complementary():
    """Every process draws the same shuffled order and yields its contiguous
    slice; concatenated slices == the single-process global batch."""
    ds = _Range(32)
    whole = DataLoader(ds, batch_size=8, seed=3)
    p0 = DataLoader(ds, batch_size=8, seed=3, process_index=0,
                    process_count=2)
    p1 = DataLoader(ds, batch_size=8, seed=3, process_index=1,
                    process_count=2)
    for full, a, b in zip(whole, p0, p1):
        assert a.shape == (4, 2, 4, 4) and b.shape == (4, 2, 4, 4)
        np.testing.assert_array_equal(np.concatenate([a, b]), full)


def test_dataloader_rejects_indivisible_process_count():
    with pytest.raises(ValueError):
        DataLoader(_Range(8), batch_size=6, process_count=4)


def test_put_global_batch_single_process():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from qaig_tpu.parallel.mesh import make_mesh
    from qaig_tpu.train.common import put_global_batch

    mesh = make_mesh(n_data=8, n_model=1)
    sharding = NamedSharding(mesh, P("data", None))
    batch = np.arange(32, dtype=np.float32).reshape(8, 4)
    arr = put_global_batch(sharding, batch)
    assert arr.sharding == sharding
    np.testing.assert_array_equal(np.asarray(arr), batch)


def _build_fixtures(tmp_path):
    """Tiny fmap dataset + decoder/codebook checkpoints (no training)."""
    import jax
    from qaig_tpu.models.conv_nets import Autoencoder, AutoencoderConfig
    from qaig_tpu.models.codebook import Codebook
    from qaig_tpu.train import common
    from qaig_tpu.train.codebook import checkpoint_dict as cb_ckpt_dict
    from qaig_tpu.utils import save_model

    rng = np.random.default_rng(0)
    rows = []
    fdir = tmp_path / "fmaps"
    fdir.mkdir()
    for i in range(16):
        fp = str(fdir / f"{i}.npy")
        with open(fp, "wb") as f:
            np.save(f, rng.standard_normal((2, 4, 4)).astype(np.float32))
        rows.append({"fmap_path": fp, "image_path": fp})
    manifest = str(tmp_path / "fmaps.json")
    write_manifest(manifest, rows)

    ae_cfg = AutoencoderConfig(num_layers=2, image_channel=3, min_channel=8,
                               max_channel=16, latent_channel=2)
    ae = Autoencoder(ae_cfg)
    ae_params = ae.init(jax.random.PRNGKey(0))
    ae_ckpt = {
        "num_layers": 2, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "latent_channel": 2,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh",
        "model": common.model_state_dict(ae_params)}
    assert save_model(ae_ckpt, dest_path=tmp_path, file_name="ae.pt")

    def make_cb(name, patch, k):
        cb = Codebook(patch_dim=(patch, patch), image_dim=(4, 4),
                      image_channel=2, num_embeddings=k,
                      init_neighbour_range=1)
        params = cb.init(jax.random.PRNGKey(k))
        assert save_model(cb_ckpt_dict(cb, params, 0), dest_path=tmp_path,
                          file_name=f"{name}.pt")
        return str(tmp_path / "models_checkpoint" / f"{name}.pt")

    cb_a = make_cb("cb_a", 4, 4)
    cb_b = make_cb("cb_b", 2, 8)
    cfg = tmp_path / "tf.json"
    cfg.write_text(json.dumps({
        "model_lr": 1e-3, "use_sliding_window": False,
        "num_dec_layers": 2, "self_attn_heads": 2, "in_dim": 16,
        "hidden_dim": 32, "hidden_activation": "silu"}))
    return {"manifest": manifest,
            "ae": str(tmp_path / "models_checkpoint" / "ae.pt"),
            "cb_a": cb_a, "cb_b": cb_b, "cfg": str(cfg)}


@pytest.mark.slow
def test_two_process_multihost_training(tmp_path):
    """Two coordinated processes drive the real transformer CLI: each loads
    its half of every global batch, the train step runs SPMD over the
    2-device global mesh, and only process 0 writes the checkpoint."""
    fx = _build_fixtures(tmp_path)
    out_dir = tmp_path / "tf_out"

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # 1 local device per process

    port = _free_port()

    def spawn(pid):
        return subprocess.Popen(
            [sys.executable, "train_quantized_transformer.py",
             "--device", "cpu", "--train-base-model",
             "--dataset-path", fx["manifest"],
             "--decoder-path", fx["ae"],
             "--lr-codebook-path", fx["cb_a"],
             "--hr-codebook-path", fx["cb_b"],
             "--config-path", fx["cfg"], "--out-dir", str(out_dir),
             "--batch-size", "4", "--checkpoint-step", "2",
             "--max-steps", "3", "--test-num-sample", "4",
             "--multihost", "--coordinator-address", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            cwd=".", env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

    procs = [spawn(0), spawn(1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid}:\n{out[-3000:]}"

    assert (out_dir / "models_checkpoint" / "model_2.pt").exists()
    # loss lines reach both consoles; the log file belongs to process 0 only
    assert "Recon Loss" in outs[0] and "Recon Loss" in outs[1]
    assert "Successfully saved model." in outs[0]
    assert "Successfully saved model." not in outs[1]
    # AR previews run SPMD over the 2-process mesh; process 0 writes them
    for name in ("ground_truth_2", "low_res_cond_2", "high_res_example_2",
                 "high_res_recon_2"):
        assert (out_dir / "images" / f"{name}.jpg").exists(), name


def test_abandoned_iterator_releases_worker_thread():
    """`next(iter(loader))` abandons the prefetch generator; the worker
    thread must notice and exit instead of blocking in q.put forever (one
    leaked thread per checkpoint preview otherwise)."""
    import gc
    import threading
    import time

    loader = DataLoader(_Range(64), batch_size=4, prefetch=1)
    before = threading.active_count()
    for _ in range(10):
        batch = next(iter(loader))
        assert batch.shape == (4, 2, 4, 4)
    gc.collect()
    deadline = time.monotonic() + 5.0
    while (threading.active_count() > before + 1
           and time.monotonic() < deadline):
        time.sleep(0.1)
    assert threading.active_count() <= before + 1


@pytest.mark.slow
def test_two_process_multihost_fmap_generation(tmp_path):
    """generate_fmap_dataset under --multihost: single-writer semantics —
    process 0 encodes and writes everything, process 1 waits at the barrier;
    both exit 0 and the manifest covers the dataset exactly once."""
    from PIL import Image

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    for i in range(10):
        arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        p = str(img_dir / f"{i}.png")
        Image.fromarray(arr).save(p)
        rows.append({"image_fpath": p, "labels": []})
    dataset_json = str(tmp_path / "dataset.json")
    write_manifest(dataset_json, rows)
    fx = _build_fixtures(tmp_path)  # reuses its AE checkpoint

    out_dir = tmp_path / "fmaps"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)

    port = _free_port()

    def spawn(pid):
        return subprocess.Popen(
            [sys.executable, "generate_fmap_dataset.py", "--device", "cpu",
             "--dataset-path", dataset_json, "--model-path", fx["ae"],
             "--out-dir", str(out_dir), "--batch-size", "4",
             "--multihost", "--coordinator-address", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            cwd=".", env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

    procs = [spawn(0), spawn(1)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid}:\n{out[-3000:]}"

    manifest = json.load(open(out_dir / "all_dataset.json"))["_default"]
    assert len(manifest) == 10  # every image exactly once (no double write)
    for row in manifest.values():
        assert os.path.exists(row["fmap_path"])
    # only process 0 wrote (its console has the progress log)
    assert "Saving Feature Maps" in outs[0]
    assert "Saving Feature Maps" not in outs[1]


@pytest.mark.slow
def test_two_process_multihost_generation(tmp_path):
    """generate_images under --multihost: the batch shards over the global
    2-process mesh, reconstructions gather before the host transfer, and
    only process 0 writes the image grids."""
    import jax
    from qaig_tpu.models.transformer import Transformer
    from qaig_tpu.train import common
    from qaig_tpu.train.transformer import (build_transformer_config,
                                            checkpoint_dict)
    from qaig_tpu.utils import save_model

    fx = _build_fixtures(tmp_path)
    tcfg = build_transformer_config(
        {"use_sliding_window": False, "num_dec_layers": 2,
         "self_attn_heads": 2, "in_dim": 16, "hidden_dim": 32,
         "hidden_activation": "silu"},
        train_base_model=True, lr_num_embeddings=4, hr_num_embeddings=8)
    tf = Transformer(tcfg)
    tf_ckpt = checkpoint_dict(tcfg, {"model_lr": 1e-3}, True, None,
                              None, None)
    tf_ckpt["model"] = common.model_state_dict(
        tf.init(jax.random.PRNGKey(2)))
    save_model(tf_ckpt, tmp_path, "tf.pt", logging=lambda m: None)

    gen_cfg = tmp_path / "gen.json"
    gen_cfg.write_text(json.dumps({
        "0": {"model_path": str(tmp_path / "models_checkpoint" / "tf.pt"),
              "lr_codebook_path": fx["cb_a"],
              "hr_codebook_path": fx["cb_b"],
              "beam_width": 2, "num_beam": 2, "temperature": 1.0}}))

    out_dir = tmp_path / "gen"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)

    port = _free_port()

    def spawn(pid):
        return subprocess.Popen(
            [sys.executable, "generate_images.py", "--device", "cpu",
             "--config-path", str(gen_cfg), "--decoder-path", fx["ae"],
             "--num-images", "2", "--seed", "7", "--out-dir", str(out_dir),
             "--multihost", "--coordinator-address", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            cwd=".", env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

    procs = [spawn(0), spawn(1)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid}:\n{out[-3000:]}"

    assert (out_dir / "images" / "recon_model_Cond.jpg").exists()
    assert (out_dir / "images" / "recon_model_0.jpg").exists()
    assert "Saving image" in outs[0]
    assert "Saving image" not in outs[1]
