"""Full 6-stage pipeline smoke on the real TPU chip (tiny synthetic data).

Usage: python scripts/smoke_tpu.py [workdir]
"""

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")
from qaig_tpu.data.manifest import write_manifest


def main(workdir=None):
    from qaig_tpu.train import autoencoder, fmap, codebook, prune, transformer
    from qaig_tpu.infer import generate
    from PIL import Image

    tmp = Path(workdir or tempfile.mkdtemp(prefix="qaig_smoke_"))
    tmp.mkdir(parents=True, exist_ok=True)
    print("workdir:", tmp)

    rng = np.random.default_rng(0)
    img_dir = tmp / "imgs"
    img_dir.mkdir(exist_ok=True)
    rows = []
    for i in range(16):
        arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        path = str(img_dir / f"{i}.png")
        Image.fromarray(arr).save(path)
        rows.append({"image_fpath": path, "labels": []})
    dataset_json = str(tmp / "dataset.json")
    write_manifest(dataset_json, rows)

    ae_cfg = tmp / "ae.json"
    ae_cfg.write_text(json.dumps({
        "model_lr": 1e-3, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "num_layers": 2, "latent_channel": 2,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh"}))
    autoencoder.run({"dataset_path": dataset_json, "config_path": ae_cfg,
                     "out_dir": tmp / "ae", "batch_size": 4,
                     "checkpoint_step": 2, "lr_step": 100, "max_epoch": 1,
                     "max_steps": 3})
    ae_ckpt = tmp / "ae" / "models_checkpoint" / "model_2.pt"

    fmap_manifest = fmap.run({"dataset_path": dataset_json,
                              "model_path": ae_ckpt,
                              "out_dir": tmp / "fmaps", "batch_size": 4})

    def train_cb(name, patch, k):
        cfg = tmp / f"cb_{name}.json"
        cfg.write_text(json.dumps({
            "model_lr": 1e-2, "image_H": 4, "image_W": 4, "image_C": 2,
            "patch_H": patch, "patch_W": patch, "num_embeddings": k,
            "neighbourhood_step": 2}))
        out = tmp / f"cb_{name}"
        codebook.run({"dataset_path": fmap_manifest, "decoder_path": ae_ckpt,
                      "config_path": cfg, "out_dir": out, "batch_size": 4,
                      "checkpoint_step": 2, "lr_step": 100, "max_epoch": 2,
                      "max_steps": 4})
        return sorted((out / "models_checkpoint").glob("codebook_*.pt"),
                      key=lambda p: int(p.stem.split("_")[1]))[-1]

    cb_a = train_cb("a", 4, 4)
    cb_b = train_cb("b", 2, 8)
    cb_c = train_cb("c", 1, 16)

    prune.run({"dataset_path": fmap_manifest, "codebook_path": cb_c,
               "batch_size": 4, "prune_threshold": 0,
               "out_dir": tmp / "pruned"})

    tf_base_cfg = tmp / "tf_base.json"
    tf_base_cfg.write_text(json.dumps({
        "model_lr": 1e-3, "use_sliding_window": False, "num_dec_layers": 2,
        "self_attn_heads": 2, "in_dim": 16, "hidden_dim": 32,
        "hidden_activation": "silu"}))
    transformer.run({"dataset_path": fmap_manifest, "train_base_model": True,
                     "decoder_path": ae_ckpt, "lr_codebook_path": cb_a,
                     "hr_codebook_path": cb_b, "config_path": tf_base_cfg,
                     "out_dir": tmp / "tf_base", "batch_size": 4,
                     "test_num_sample": 2, "checkpoint_step": 2,
                     "lr_step": 100, "max_epoch": 2, "max_steps": 3,
                     "temperature": 1.0})
    tf_base_ckpt = tmp / "tf_base" / "models_checkpoint" / "model_2.pt"

    tf_casc_cfg = tmp / "tf_casc.json"
    tf_casc_cfg.write_text(json.dumps({
        "model_lr": 1e-3, "use_sliding_window": True, "sliding_window": 8,
        "num_enc_layers": 1, "num_dec_layers": 2, "self_attn_heads": 2,
        "cross_attn_heads": 2, "in_dim": 16, "hidden_dim": 32,
        "hidden_activation": "silu"}))
    transformer.run({"dataset_path": fmap_manifest,
                     "train_base_model": False, "decoder_path": ae_ckpt,
                     "lr_codebook_path": cb_b, "hr_codebook_path": cb_c,
                     "config_path": tf_casc_cfg, "out_dir": tmp / "tf_casc",
                     "batch_size": 4, "test_num_sample": 2,
                     "checkpoint_step": 2, "lr_step": 100, "max_epoch": 2,
                     "max_steps": 3, "temperature": 1.0})
    tf_casc_ckpt = tmp / "tf_casc" / "models_checkpoint" / "model_2.pt"

    gen_cfg = tmp / "gen.json"
    gen_cfg.write_text(json.dumps({
        "0": {"model_path": str(tf_base_ckpt), "lr_codebook_path": str(cb_a),
              "hr_codebook_path": str(cb_b), "beam_width": 2, "num_beam": 2,
              "temperature": 1.0},
        "1": {"model_path": str(tf_casc_ckpt), "lr_codebook_path": str(cb_b),
              "hr_codebook_path": str(cb_c), "beam_width": 4, "num_beam": 2,
              "temperature": 1.0}}))
    tokens = generate.run({"decoder_path": ae_ckpt, "config_path": gen_cfg,
                           "out_dir": tmp / "gen", "num_images": 3,
                           "seed": 7})
    tokens = np.asarray(tokens)
    assert tokens.shape == (3, 16) and tokens.min() >= 0 and tokens.max() < 16
    print("TPU smoke OK — generated tokens", tokens.shape)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
