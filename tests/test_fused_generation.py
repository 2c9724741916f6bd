"""Fused single-dispatch CLI generation: token-identical to the dispatched
per-stage loop, auto-engaged when unsharded, rejected when sharded.

The fused path is the batch-1 interactive-latency fix for the reference's
actual entry point (``/root/reference/generate_images.py:256-337``): one
device program for the whole cascade instead of hundreds of sequential
per-segment dispatches (measured 0.18 s vs 0.42 s solo on v5e,
``scripts/probe_latency.py``)."""

import json

import jax
import numpy as np
import pytest


def _ckpts(tmp_path):
    """Decoder + 3 codebooks + base/cascade transformer checkpoints in the
    framework's own (reference-schema) formats — no training needed."""
    from qaig_tpu.models.codebook import Codebook
    from qaig_tpu.models.conv_nets import Autoencoder, AutoencoderConfig
    from qaig_tpu.models.transformer import Transformer, TransformerConfig
    from qaig_tpu.train import common
    from qaig_tpu.train.codebook import checkpoint_dict as cb_ckpt_dict
    from qaig_tpu.train.transformer import checkpoint_dict as tf_ckpt_dict
    from qaig_tpu.utils import save_model

    paths = {}
    ae = Autoencoder(AutoencoderConfig(
        num_layers=2, image_channel=3, min_channel=8, max_channel=16,
        latent_channel=2))
    assert save_model({
        "num_layers": 2, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "latent_channel": 2,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh",
        "model": common.model_state_dict(ae.init(jax.random.PRNGKey(0)))},
        dest_path=tmp_path, file_name="ae.pt")
    paths["decoder"] = str(tmp_path / "models_checkpoint" / "ae.pt")

    def save_cb(name, patch, k):
        cb = Codebook(patch_dim=(patch, patch), image_dim=(4, 4),
                      image_channel=2, num_embeddings=k,
                      init_neighbour_range=1)
        assert save_model(
            cb_ckpt_dict(cb, cb.init(jax.random.PRNGKey(k)), 0),
            dest_path=tmp_path, file_name=f"{name}.pt")
        paths[name] = str(tmp_path / "models_checkpoint" / f"{name}.pt")

    save_cb("cb_a", 4, 4)    # 1 token / latent
    save_cb("cb_b", 2, 8)    # 4 tokens
    save_cb("cb_c", 1, 16)   # 16 tokens

    def save_tf(name, cfg, sliding_window):
        model = Transformer(cfg)
        params = model.init(jax.random.PRNGKey(7))
        ckpt = tf_ckpt_dict(cfg, {}, not cfg.use_encoder, sliding_window,
                            params, None)
        ckpt["model"] = common.model_state_dict(params)
        assert save_model(ckpt, dest_path=tmp_path, file_name=f"{name}.pt")
        paths[name] = str(tmp_path / "models_checkpoint" / f"{name}.pt")

    save_tf("tf0", TransformerConfig(
        use_encoder=False, use_pos_cond=False, num_dec_layers=2,
        num_dec_embedding=4 + 8, self_attn_heads=2, in_dim=16,
        out_dim=8 + 1, hidden_dim=32, hidden_activation="silu"), None)
    save_tf("tf1", TransformerConfig(
        use_encoder=True, use_pos_cond=True, num_enc_layers=1,
        num_dec_layers=2, num_enc_embedding=8, num_dec_embedding=16 + 1,
        self_attn_heads=2, cross_attn_heads=2, in_dim=16, out_dim=16 + 1,
        hidden_dim=32, hidden_activation="silu"), 8)

    config = {
        "0": {"model_path": paths["tf0"], "lr_codebook_path": paths["cb_a"],
              "hr_codebook_path": paths["cb_b"], "temperature": 1.0,
              "num_beam": 2, "beam_width": 2},
        "1": {"model_path": paths["tf1"], "lr_codebook_path": paths["cb_b"],
              "hr_codebook_path": paths["cb_c"], "temperature": 1.0,
              "num_beam": 2, "beam_width": 4}}
    paths["config"] = str(tmp_path / "gen_config.json")
    with open(paths["config"], "w") as f:
        json.dump(config, f)
    return paths


@pytest.mark.slow
def test_fused_cli_tokens_match_dispatched(tmp_path, capsys):
    """num_images=1 makes the mesh trivial, so the CLI auto-selects the
    fused program; its tokens must equal the forced dispatched loop's, and
    both must write the same per-stage grids."""
    from qaig_tpu.infer import generate

    paths = _ckpts(tmp_path)

    def gen(out, fused):
        args = {"config_path": paths["config"],
                "decoder_path": paths["decoder"],
                "out_dir": tmp_path / out, "num_images": 1, "seed": 3}
        if fused is not None:
            args["fused"] = fused
        return np.asarray(generate.run(args))

    tok_auto = gen("auto", None)  # unsharded -> fused by default
    assert "Fused single-dispatch cascade" in capsys.readouterr().out
    tok_dispatched = gen("dispatched", False)
    assert "Fused single-dispatch cascade" not in capsys.readouterr().out
    np.testing.assert_array_equal(tok_auto, tok_dispatched)

    for out in ("auto", "dispatched"):
        for grid in ("recon_model_Cond", "recon_model_0", "recon_model_1"):
            assert (tmp_path / out / "images" / f"{grid}.jpg").exists()


@pytest.mark.slow
def test_fused_rejects_sharded_generation(tmp_path):
    """--fused with a non-trivial mesh (8 virtual devices shard a batch of
    4 over 'data') must fail fast, not silently unshard."""
    from qaig_tpu.infer import generate

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    paths = _ckpts(tmp_path)
    with pytest.raises(ValueError, match="fused"):
        generate.run({"config_path": paths["config"],
                      "decoder_path": paths["decoder"],
                      "out_dir": tmp_path / "out", "num_images": 4,
                      "seed": 3, "fused": True})
