"""CLI argparse contracts: every entry point parses --help (catches import
or flag breakage without running the stages)."""

import subprocess
import sys

import pytest

CLIS = [
    "train_autoencoder.py",
    "generate_fmap_dataset.py",
    "train_codebook.py",
    "prune_codebook.py",
    "train_quantized_transformer.py",
    "generate_images.py",
]


@pytest.mark.parametrize("cli", CLIS)
def test_cli_help(cli):
    result = subprocess.run(
        [sys.executable, cli, "--help"],
        capture_output=True, text=True, timeout=120, cwd=".")
    assert result.returncode == 0, result.stderr[-500:]
    assert "--out-dir" in result.stdout


@pytest.mark.slow
def test_cli_subprocess_pipeline(tmp_path):
    """Drive all six CLIs end-to-end via subprocess on a tiny synthetic
    dataset — covers the argparse->run wiring (type coercions, pathlib,
    defaults) that calling run(dict) directly cannot."""
    import json
    import os

    import numpy as np
    from PIL import Image

    from qaig_tpu.data.manifest import write_manifest

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")

    def cli(script, *flags):
        result = subprocess.run(
            [sys.executable, script, "--device", "cpu", *flags],
            capture_output=True, text=True, timeout=420, cwd=".", env=env)
        assert result.returncode == 0, (script, result.stderr[-2000:])
        return result

    # synthetic dataset
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    for i in range(16):
        arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        p = str(img_dir / f"{i}.png")
        Image.fromarray(arr).save(p)
        rows.append({"image_fpath": p, "labels": []})
    manifest = str(tmp_path / "dataset.json")
    write_manifest(manifest, rows)

    def cfg(name, payload):
        path = tmp_path / name
        path.write_text(json.dumps(payload))
        return str(path)

    ae_cfg = cfg("ae.json", {
        "model_lr": 1e-3, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "num_layers": 2, "latent_channel": 2,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh"})
    ae_out = tmp_path / "ae"
    cli("train_autoencoder.py", "--dataset-path", manifest,
        "--config-path", ae_cfg, "--out-dir", str(ae_out),
        "--batch-size", "4", "--checkpoint-step", "2", "--max-steps", "3")
    ae_ckpt = str(ae_out / "models_checkpoint" / "model_2.pt")
    assert os.path.exists(ae_ckpt)

    fmap_out = tmp_path / "fmaps"
    cli("generate_fmap_dataset.py", "--dataset-path", manifest,
        "--model-path", ae_ckpt, "--out-dir", str(fmap_out),
        "--batch-size", "4")
    fmap_manifest = str(fmap_out / "all_dataset.json")
    assert os.path.exists(fmap_manifest)

    def train_cb(name, patch, k):
        c = cfg(f"cb_{name}.json", {
            "model_lr": 1e-2, "image_H": 4, "image_W": 4, "image_C": 2,
            "patch_H": patch, "patch_W": patch, "num_embeddings": k,
            "neighbourhood_step": 2})
        out = tmp_path / f"cb_{name}"
        cli("train_codebook.py", "--dataset-path", fmap_manifest,
            "--decoder-path", ae_ckpt, "-c", c, "--out-dir", str(out),
            "--batch-size", "4", "--checkpoint-step", "2",
            "--max-steps", "3")
        return str(out / "models_checkpoint" / "codebook_2.pt")

    cb_a = train_cb("a", 4, 4)
    cb_b = train_cb("b", 2, 8)

    prune_out = tmp_path / "pruned"
    cli("prune_codebook.py", "--dataset-path", fmap_manifest,
        "--codebook-path", cb_b, "--prune-threshold", "0",
        "--out-dir", str(prune_out), "--batch-size", "4")
    assert (prune_out / "models_checkpoint" / "pruned_codebook.pt").exists()

    tf_cfg = cfg("tf.json", {
        "model_lr": 1e-3, "use_sliding_window": False,
        "num_dec_layers": 2, "self_attn_heads": 2, "in_dim": 16,
        "hidden_dim": 32, "hidden_activation": "silu"})
    tf_out = tmp_path / "tf"
    cli("train_quantized_transformer.py", "--train-base-model",
        "--dataset-path", fmap_manifest, "--decoder-path", ae_ckpt,
        "--lr-codebook-path", cb_a, "--hr-codebook-path", cb_b,
        "--config-path", tf_cfg, "--out-dir", str(tf_out),
        "--batch-size", "4", "--test-num-sample", "2",
        "--checkpoint-step", "2", "--max-steps", "3",
        "--num-model-shards", "2", "--skip-preview", "--bf16")
    tf_ckpt = str(tf_out / "models_checkpoint" / "model_2.pt")
    assert os.path.exists(tf_ckpt)

    gen_cfg = cfg("gen.json", {
        "0": {"model_path": tf_ckpt, "lr_codebook_path": cb_a,
              "hr_codebook_path": cb_b, "temperature": 1.0,
              "num_beam": 2, "beam_width": 2}})
    gen_out = tmp_path / "gen"
    cli("generate_images.py", "--config-path", gen_cfg,
        "--decoder-path", ae_ckpt, "--num-images", "4",
        "--out-dir", str(gen_out), "--bf16")
    assert (gen_out / "images" / "recon_model_0.jpg").exists()
    assert (gen_out / "images" / "recon_model_Cond.jpg").exists()


@pytest.mark.slow
def test_bench_smoke_multichip_sharded(tmp_path):
    """bench.py --scale smoke on the 8-virtual-device CPU backend must
    exercise the multi-chip batch-sharding path (n_chips == 8) and emit
    the full machine-ledger JSON line the driver parses."""
    import json
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    result = subprocess.run(
        [sys.executable, "bench.py", "--device", "cpu", "--scale", "smoke",
         "--iters", "1", "--batch", "4"],
        capture_output=True, text=True, timeout=420, cwd=".", env=env)
    assert result.returncode == 0, result.stderr[-2000:]
    line = result.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "cascade_images_per_sec_per_chip"
    assert out["n_chips"] == 8
    assert out["mode"] == "beams"
    assert out["value"] > 0
    for field in ("mfu", "decode_tokens_per_sec_per_chip",
                  "iter_time_mean_s", "vs_baseline"):
        assert field in out, field


@pytest.mark.slow
def test_compilation_cache_speeds_up_restart(tmp_path):
    """--compilation-cache-dir: the first run populates the persistent XLA
    cache; a process restart with the same shapes adds NO new entries (all
    programs deserialize) and starts substantially faster."""
    import json
    import os
    import time

    import jax

    from qaig_tpu.models.codebook import Codebook
    from qaig_tpu.models.transformer import Transformer
    from qaig_tpu.train import common as train_common
    from qaig_tpu.train import autoencoder as ae_stage
    from qaig_tpu.train import codebook as cb_stage
    from qaig_tpu.train.autoencoder import build_autoencoder
    from qaig_tpu.train.transformer import (build_transformer_config,
                                            checkpoint_dict)
    from qaig_tpu.utils import save_model

    # untrained checkpoints are enough: caching is about program shapes
    cfg_dict = {
        "model_lr": 1e-3, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "num_layers": 1, "latent_channel": 4,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh"}
    model, cfg = build_autoencoder(cfg_dict)
    save_model(ae_stage.checkpoint_dict(
        cfg, model.init(jax.random.PRNGKey(0)), None), tmp_path, "ae.pt",
        logging=lambda m: None)
    cb = Codebook(patch_dim=(2, 2), image_dim=(4, 4), image_channel=4,
                  num_embeddings=8, init_neighbour_range=4)
    save_model(cb_stage.checkpoint_dict(cb, cb.init(jax.random.PRNGKey(1)),
                                        0), tmp_path, "cb.pt",
               logging=lambda m: None)
    tcfg = build_transformer_config(
        {"use_sliding_window": False, "num_dec_layers": 1,
         "self_attn_heads": 2, "in_dim": 16, "hidden_dim": 32,
         "hidden_activation": "silu"},
        train_base_model=True, lr_num_embeddings=8, hr_num_embeddings=8)
    tf = Transformer(tcfg)
    tf_ckpt = checkpoint_dict(tcfg, {"model_lr": 1e-3}, True, None,
                              None, None)
    tf_ckpt["model"] = train_common.model_state_dict(
        tf.init(jax.random.PRNGKey(2)))
    save_model(tf_ckpt, tmp_path, "tf.pt", logging=lambda m: None)

    ckpt = tmp_path / "models_checkpoint"
    gen_cfg = tmp_path / "gen.json"
    gen_cfg.write_text(json.dumps({
        "0": {"model_path": str(ckpt / "tf.pt"),
              "lr_codebook_path": str(ckpt / "cb.pt"),
              "hr_codebook_path": str(ckpt / "cb.pt"),
              "beam_width": 2, "num_beam": 2, "temperature": 1.0}}))

    cache = tmp_path / "xlacache"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")

    def run(out):
        t0 = time.monotonic()
        result = subprocess.run(
            [sys.executable, "generate_images.py", "--device", "cpu",
             "--config-path", str(gen_cfg),
             "--decoder-path", str(ckpt / "ae.pt"),
             "--num-images", "2", "--seed", "7",
             "--out-dir", str(tmp_path / out),
             "--compilation-cache-dir", str(cache)],
            capture_output=True, text=True, timeout=420, cwd=".", env=env)
        assert result.returncode == 0, result.stderr[-2000:]
        return time.monotonic() - t0

    def entries():
        return sum(len(files) for _, _, files in os.walk(cache))

    t_cold = run("gen1")
    n_cold = entries()
    assert n_cold > 0  # the cache was written
    t_warm = run("gen2")
    assert entries() == n_cold  # every program came from the cache
    assert t_warm < 0.8 * t_cold, (t_cold, t_warm)


def test_console_entry_points_resolve():
    """Every [project.scripts] target imports and is callable (pip-installed
    `qaig-*` commands mirror the root-level reference-parity scripts)."""
    import importlib
    tomllib = pytest.importorskip("tomllib")  # stdlib from 3.11

    with open("pyproject.toml", "rb") as f:
        cfg = tomllib.load(f)
    scripts = cfg["project"]["scripts"]
    assert len(scripts) >= 8
    for name, target in scripts.items():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn)), name


def test_example_configs_parse():
    """examples/configs/*.json (reference-README values) construct real
    models/configs through the same builders the CLIs use."""
    import json
    import pathlib

    from qaig_tpu.models.codebook import Codebook
    from qaig_tpu.train.autoencoder import build_autoencoder
    from qaig_tpu.train.transformer import build_transformer_config

    cfgs = pathlib.Path("examples/configs")
    build_autoencoder(json.load(open(cfgs / "autoencoder.json")))
    for name, base in [("transformer_base.json", True),
                       ("transformer_cascade.json", False)]:
        tcfg = build_transformer_config(
            json.load(open(cfgs / name)), train_base_model=base,
            lr_num_embeddings=512, hr_num_embeddings=512)
        assert tcfg.in_dim == 512 and tcfg.hidden_dim == 2048
    for name in ("codebook_lr.json", "codebook_hr.json"):
        c = json.load(open(cfgs / name))
        cb = Codebook(patch_dim=(c["patch_H"], c["patch_W"]),
                      image_dim=(c["image_H"], c["image_W"]),
                      image_channel=c["image_C"],
                      num_embeddings=c["num_embeddings"],
                      init_neighbour_range=c["num_embeddings"] // 2)
        assert cb.seq_len in (1, 16)
    gen = json.load(open(cfgs / "generate.json"))
    assert set(gen) == {"0", "1", "2"}
    for stage in gen.values():
        assert {"model_path", "lr_codebook_path", "hr_codebook_path",
                "beam_width", "num_beam", "temperature"} <= set(stage)
