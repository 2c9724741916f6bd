"""Negative-path contracts: validation errors match the reference's
semantics (invalid beam width, missing checkpoints, bad activation names,
codebook parameter validation)."""

import pytest

from qaig_tpu.utils import load_model
from qaig_tpu.ops.activations import get_activation
from qaig_tpu.models.codebook import Codebook


def test_load_model_missing_path_returns_false(tmp_path):
    """Boolean status contract (reference utils/model_utils.py:36-52):
    missing checkpoint -> (False, None), no exception."""
    status, ckpt = load_model(tmp_path / "nope.pt", logging=lambda m: None)
    assert status is False and ckpt is None


def test_get_activation_unknown_name_raises():
    """Reference get_activation KeyErrors on unknown names
    (models/layers.py:74-80)."""
    with pytest.raises(KeyError):
        get_activation("relu")


def test_codebook_neighbourhood_range_quirk_preserved():
    """The reference's validation (models/Codebook.py:27-28) uses
    ``range > num_embeddings and range < 1`` — an unsatisfiable condition,
    so out-of-range values are silently accepted.  We preserve the quirk
    (same checkpoints must load identically) rather than 'fixing' it."""
    cb = Codebook(patch_dim=(2, 2), image_dim=(4, 4), image_channel=2,
                  num_embeddings=16, init_neighbour_range=0)
    assert cb.neighbourhood_range == 0


def test_codebook_decrease_neighbourhood_invalid_steps():
    cb = Codebook(patch_dim=(2, 2), image_dim=(4, 4), image_channel=2,
                  num_embeddings=16, init_neighbour_range=8)
    with pytest.raises(ValueError, match="steps"):
        cb.decrease_neighbourhood(0)


@pytest.mark.slow
def test_generate_invalid_beam_width(tmp_path):
    """beam_width must divide the stage's token count
    (reference generate_images.py:165-168)."""
    import json
    import jax
    from qaig_tpu.infer import generate
    from qaig_tpu.train.autoencoder import build_autoencoder
    from qaig_tpu.train import autoencoder as ae_stage
    from qaig_tpu.train import codebook as cb_stage
    from qaig_tpu.utils import save_model

    # minimal AE + codebook + base transformer checkpoints
    cfg_dict = {
        "model_lr": 1e-3, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "num_layers": 1, "latent_channel": 4,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh"}
    model, cfg = build_autoencoder(cfg_dict)
    params = model.init(jax.random.PRNGKey(0))
    save_model(ae_stage.checkpoint_dict(cfg, params, None), tmp_path,
               "ae.pt", logging=lambda m: None)
    ae_ckpt = tmp_path / "models_checkpoint" / "ae.pt"

    cb = Codebook(patch_dim=(2, 2), image_dim=(4, 4), image_channel=4,
                  num_embeddings=8, init_neighbour_range=4)
    cb_params = cb.init(jax.random.PRNGKey(1))
    save_model(cb_stage.checkpoint_dict(cb, cb_params, 0), tmp_path,
               "cb.pt", logging=lambda m: None)
    cb_ckpt = tmp_path / "models_checkpoint" / "cb.pt"

    from qaig_tpu.models.transformer import Transformer
    from qaig_tpu.train.transformer import (build_transformer_config,
                                            checkpoint_dict)
    tcfg = build_transformer_config(
        {"use_sliding_window": False, "num_dec_layers": 1,
         "self_attn_heads": 2, "in_dim": 16, "hidden_dim": 32,
         "hidden_activation": "silu"},
        train_base_model=True, lr_num_embeddings=8, hr_num_embeddings=8)
    tf = Transformer(tcfg)
    tf_params = tf.init(jax.random.PRNGKey(2))
    save_model(checkpoint_dict(tcfg, {"model_lr": 1e-3}, True, None,
                               tf_params, None), tmp_path, "tf.pt",
               logging=lambda m: None)
    tf_ckpt = tmp_path / "models_checkpoint" / "tf.pt"

    # codebook seq_len = (4/2)*(4/2) = 4 tokens; beam_width 3 doesn't divide
    gen_cfg = {"0": {"model_path": str(tf_ckpt),
                     "lr_codebook_path": str(cb_ckpt),
                     "hr_codebook_path": str(cb_ckpt),
                     "beam_width": 3, "num_beam": 2, "temperature": 1.0}}
    cfg_path = tmp_path / "gen.json"
    cfg_path.write_text(json.dumps(gen_cfg))
    with pytest.raises(ValueError, match="beam_width"):
        generate.run({"decoder_path": ae_ckpt, "config_path": cfg_path,
                      "out_dir": tmp_path / "gen", "num_images": 2,
                      "seed": 0})
