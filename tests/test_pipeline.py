"""End-to-end 6-stage pipeline on a tiny synthetic dataset.

Exercises every CLI-level stage through the same on-disk contracts the
reference uses (TinyDB manifests, .npy latents, self-describing checkpoint
dicts): autoencoder training -> feature-map cache -> two codebooks ->
pruning -> base + cascade transformer training (with AR preview) -> cascade
image generation.
"""

import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

from qaig_tpu.data.manifest import write_manifest

pytestmark = pytest.mark.slow


def _write_images(tmp_path, n=16, size=16):
    from PIL import Image
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        path = str(img_dir / f"{i}.png")
        Image.fromarray(arr).save(path)
        rows.append({"image_fpath": path, "labels": []})
    manifest = str(tmp_path / "dataset.json")
    write_manifest(manifest, rows)
    return manifest


def test_full_pipeline(tmp_path):
    from qaig_tpu.train import autoencoder, fmap, codebook, prune, transformer
    from qaig_tpu.infer import generate

    dataset_json = _write_images(tmp_path)

    # -- stage 1: autoencoder ------------------------------------------------
    ae_cfg = {
        "model_lr": 1e-3, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "num_layers": 2, "latent_channel": 2,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh",
    }
    ae_cfg_path = tmp_path / "ae_config.json"
    ae_cfg_path.write_text(json.dumps(ae_cfg))
    ae_out = tmp_path / "ae"
    autoencoder.run({
        "dataset_path": dataset_json, "config_path": ae_cfg_path,
        "out_dir": ae_out, "batch_size": 4, "checkpoint_step": 2,
        "lr_step": 100, "max_epoch": 1, "max_steps": 3})
    ae_ckpt = ae_out / "models_checkpoint" / "model_2.pt"
    assert ae_ckpt.exists()
    assert (ae_out / "images" / "recon_2.jpg").exists()

    # -- stage 2: feature maps ----------------------------------------------
    fmap_out = tmp_path / "fmaps"
    fmap_manifest = fmap.run({
        "dataset_path": dataset_json, "model_path": ae_ckpt,
        "out_dir": fmap_out, "batch_size": 4})
    assert os.path.exists(fmap_manifest)
    first_fmap = json.load(open(fmap_manifest))["_default"]["1"]["fmap_path"]
    latent = np.load(open(first_fmap, "rb"))
    assert latent.shape == (2, 4, 4)  # (C, H/4, W/4)

    # -- stage 3: codebooks (coarse A: 1 token; mid B: 4; fine C: 16) -------
    def train_cb(name, patch, k, steps=4):
        cfg = {"model_lr": 1e-2, "image_H": 4, "image_W": 4, "image_C": 2,
               "patch_H": patch, "patch_W": patch, "num_embeddings": k,
               "neighbourhood_step": 2}
        cfg_path = tmp_path / f"cb_{name}.json"
        cfg_path.write_text(json.dumps(cfg))
        out = tmp_path / f"cb_{name}_out"
        codebook.run({
            "dataset_path": fmap_manifest, "decoder_path": ae_ckpt,
            "config_path": cfg_path, "out_dir": out, "batch_size": 4,
            "checkpoint_step": 2, "lr_step": 100, "max_epoch": 2,
            "max_steps": steps})
        ckpts = sorted((out / "models_checkpoint").glob("codebook_*.pt"),
                       key=lambda p: int(p.stem.split("_")[1]))
        return ckpts[-1]

    cb_a = train_cb("a", 4, 4)   # 1 token / image
    cb_b = train_cb("b", 2, 8)   # 4 tokens
    cb_c = train_cb("c", 1, 16)  # 16 tokens

    # -- stage 4: prune ------------------------------------------------------
    prune_out = tmp_path / "pruned"
    new_model, _ = prune.run({
        "dataset_path": fmap_manifest, "codebook_path": cb_c,
        "batch_size": 4, "prune_threshold": 0, "out_dir": prune_out})
    pruned = prune_out / "models_checkpoint" / "pruned_codebook.pt"
    assert pruned.exists()
    assert new_model.num_embeddings == 16  # threshold 0 keeps everything

    # -- stage 5a: base transformer (lr=A 1 token, hr=B 4 tokens) -----------
    tf_base_cfg = {
        "model_lr": 1e-3, "use_sliding_window": False,
        "num_dec_layers": 2, "self_attn_heads": 2, "in_dim": 16,
        "hidden_dim": 32, "hidden_activation": "silu"}
    tf_base_cfg_path = tmp_path / "tf_base.json"
    tf_base_cfg_path.write_text(json.dumps(tf_base_cfg))
    tf_base_out = tmp_path / "tf_base"
    transformer.run({
        "dataset_path": fmap_manifest, "train_base_model": True,
        "decoder_path": ae_ckpt, "lr_codebook_path": cb_a,
        "hr_codebook_path": cb_b, "config_path": tf_base_cfg_path,
        "out_dir": tf_base_out, "batch_size": 4, "test_num_sample": 2,
        "checkpoint_step": 2, "lr_step": 100, "max_epoch": 2,
        "max_steps": 3, "temperature": 1.0})
    tf_base_ckpt = tf_base_out / "models_checkpoint" / "model_2.pt"
    assert tf_base_ckpt.exists()
    assert (tf_base_out / "images" / "high_res_recon_2.jpg").exists()

    # -- stage 5b: cascade transformer (lr=B, hr=C, sliding window) ---------
    tf_casc_cfg = {
        "model_lr": 1e-3, "use_sliding_window": True, "sliding_window": 8,
        "num_enc_layers": 1, "num_dec_layers": 2, "self_attn_heads": 2,
        "cross_attn_heads": 2, "in_dim": 16, "hidden_dim": 32,
        "hidden_activation": "silu"}
    tf_casc_cfg_path = tmp_path / "tf_casc.json"
    tf_casc_cfg_path.write_text(json.dumps(tf_casc_cfg))
    tf_casc_out = tmp_path / "tf_casc"
    transformer.run({
        "dataset_path": fmap_manifest, "train_base_model": False,
        "decoder_path": ae_ckpt, "lr_codebook_path": cb_b,
        "hr_codebook_path": cb_c, "config_path": tf_casc_cfg_path,
        "out_dir": tf_casc_out, "batch_size": 4, "test_num_sample": 2,
        "checkpoint_step": 2, "lr_step": 100, "max_epoch": 2,
        "max_steps": 3, "temperature": 1.0})
    tf_casc_ckpt = tf_casc_out / "models_checkpoint" / "model_2.pt"
    assert tf_casc_ckpt.exists()
    assert (tf_casc_out / "images" / "high_res_recon_2.jpg").exists()

    # -- stage 6: cascade generation ----------------------------------------
    gen_cfg = {
        "0": {"model_path": str(tf_base_ckpt),
              "lr_codebook_path": str(cb_a),
              "hr_codebook_path": str(cb_b),
              "beam_width": 2, "num_beam": 2, "temperature": 1.0},
        "1": {"model_path": str(tf_casc_ckpt),
              "lr_codebook_path": str(cb_b),
              "hr_codebook_path": str(cb_c),
              "beam_width": 4, "num_beam": 2, "temperature": 1.0},
    }
    gen_cfg_path = tmp_path / "gen.json"
    gen_cfg_path.write_text(json.dumps(gen_cfg))
    gen_out = tmp_path / "gen"
    tokens = generate.run({
        "decoder_path": ae_ckpt, "config_path": gen_cfg_path,
        "out_dir": gen_out, "num_images": 3, "seed": 7})

    tokens = np.asarray(tokens)
    assert tokens.shape == (3, 16)
    assert tokens.min() >= 0 and tokens.max() < 16
    assert (gen_out / "images" / "recon_model_Cond.jpg").exists()
    assert (gen_out / "images" / "recon_model_0.jpg").exists()
    assert (gen_out / "images" / "recon_model_1.jpg").exists()

    # -- library-level pipeline API (load once, generate many) --------------
    from qaig_tpu.infer.pipeline import CascadePipeline
    pipe = CascadePipeline.from_config(gen_cfg, ae_ckpt)
    images, tokens2 = pipe.generate(2, seed=3)
    assert images.shape == (2, 3, 16, 16)
    assert np.asarray(tokens2).shape == (2, 16)
    images2, _ = pipe.generate(2, seed=3)
    np.testing.assert_array_equal(np.asarray(images), np.asarray(images2))

    # -- bf16 serving precision: whole cascade in bfloat16 ------------------
    import jax.numpy as jnp
    pipe16 = CascadePipeline.from_config(gen_cfg, ae_ckpt,
                                         dtype=jnp.bfloat16)
    img16, tok16 = pipe16.generate(2, seed=3)
    assert img16.dtype == jnp.float32  # host-friendly output
    assert img16.shape == (2, 3, 16, 16)
    tok16 = np.asarray(tok16)
    assert tok16.shape == (2, 16)
    assert tok16.min() >= 0 and tok16.max() < 16
    assert np.isfinite(np.asarray(img16)).all()

    # the CLI flag drives the same cast
    gen16_out = tmp_path / "gen16"
    tokens16 = generate.run({
        "decoder_path": ae_ckpt, "config_path": gen_cfg_path,
        "out_dir": gen16_out, "num_images": 2, "seed": 7, "bf16": True})
    tokens16 = np.asarray(tokens16)
    assert tokens16.shape == (2, 16)
    assert tokens16.min() >= 0 and tokens16.max() < 16
    assert (gen16_out / "images" / "recon_model_1.jpg").exists()

    # -- quality eval CLI over the same artifacts ----------------------------
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "eval_quality",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "eval_quality.py"))
    eval_quality = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(eval_quality)
    import sys
    argv = sys.argv
    sys.argv = ["eval_quality.py", "--device", "cpu",
                "--dataset-path", str(dataset_json),
                "--model-path", str(ae_ckpt),
                "--codebook-path", str(cb_c),
                "--batch-size", "8", "--max-images", "12"]
    try:
        import io
        from contextlib import redirect_stdout
        buf = io.StringIO()
        with redirect_stdout(buf):
            eval_quality.main()
    finally:
        sys.argv = argv
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["num_images"] == 12
    assert np.isfinite(report["psnr_recon_db"])
    assert len(report["psnr_quantized_db"]) == 1
    assert all(np.isfinite(v) for v in report["psnr_quantized_db"].values())
