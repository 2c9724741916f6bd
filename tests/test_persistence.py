"""Manifests, checkpoint round-trips, tolerant restore, optimizer schedule."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from qaig_tpu.data.manifest import Manifest, write_manifest
from qaig_tpu.utils.checkpoint import (save_model, load_model, flatten_tree,
                                       unflatten_tree, tolerant_restore)
from qaig_tpu.train.optim import make_adam, current_lr, halving_schedule


def test_manifest_roundtrip(tmp_path):
    rows = [{"image_fpath": f"/x/{i}.png", "labels": []} for i in range(5)]
    path = tmp_path / "dataset.json"
    write_manifest(path, rows)
    m = Manifest(path)
    assert len(m) == 5
    assert m[3]["image_fpath"] == "/x/3.png"
    # TinyDB layout on disk
    import json
    raw = json.load(open(path))
    assert set(raw) == {"_default"}
    assert raw["_default"]["1"]["image_fpath"] == "/x/0.png"


def test_manifest_overwrite(tmp_path):
    """write_manifest onto an existing path must replace it cleanly
    (regression: the old implementation json-decoded os.devnull and
    crashed the first time any manifest was ever overwritten — hit by
    quality_run --resume re-writing its dataset manifests)."""
    path = tmp_path / "dataset.json"
    write_manifest(path, [{"image_fpath": "/a.png", "labels": []}])
    write_manifest(path, [{"image_fpath": f"/b{i}.png", "labels": []}
                          for i in range(3)])
    m = Manifest(path)
    assert len(m) == 3
    assert m[0]["image_fpath"] == "/b0.png"


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": {"b": jnp.arange(6).reshape(2, 3).astype(jnp.float32)},
            "meta": 7, "name": "x",
            "lst": [jnp.zeros(2), jnp.ones(3)]}
    assert save_model(tree, tmp_path, "ck.pt")
    ok, loaded = load_model(tmp_path / "models_checkpoint" / "ck.pt")
    assert ok
    np.testing.assert_array_equal(loaded["a"]["b"],
                                  np.arange(6).reshape(2, 3))
    assert loaded["meta"] == 7 and loaded["name"] == "x"
    np.testing.assert_array_equal(loaded["lst"][1], np.ones(3))


def test_load_model_reads_torch_pt_files(tmp_path):
    """Reference checkpoints are torch.save zip archives; load_model must
    read them transparently (pretrained-weights import path)."""
    torch = __import__("pytest").importorskip("torch")
    ckpt = {"num_layers": 2,
            "model": {"w": torch.arange(6, dtype=torch.float32).reshape(2, 3)}}
    path = tmp_path / "ref.pt"
    torch.save(ckpt, path)

    from qaig_tpu.utils.checkpoint import load_model
    ok, loaded = load_model(path)
    assert ok
    assert loaded["num_layers"] == 2
    np.testing.assert_array_equal(loaded["model"]["w"],
                                  np.arange(6, dtype=np.float32).reshape(2, 3))


def test_orbax_backend_roundtrip(tmp_path):
    """Model weights + metadata round-trip through the orbax backend and
    feed tolerant_restore like any other checkpoint."""
    pytest_orbax = __import__("pytest").importorskip("orbax.checkpoint")
    from qaig_tpu.utils.checkpoint import save_model_orbax, load_model

    ckpt = {"num_layers": 2, "name": "ae",
            "model": {"layers.0.w": np.ones((2, 3), np.float32),
                      "layers.0.b": np.zeros((3,), np.float32)}}
    assert save_model_orbax(ckpt, tmp_path, "m.pt")
    ok, loaded = load_model(tmp_path / "models_checkpoint" / "m.pt.orbax")
    assert ok
    assert loaded["num_layers"] == 2
    np.testing.assert_array_equal(loaded["model"]["layers.0.w"],
                                  np.ones((2, 3)))


def test_flatten_unflatten():
    tree = {"a": [{"w": jnp.zeros((2,))}, {"w": jnp.ones((3,))}],
            "b": {"c": jnp.full((1,), 5.0)}}
    flat = flatten_tree(tree)
    assert set(flat) == {"a.0.w", "a.1.w", "b.c"}
    rebuilt = unflatten_tree(flat, like=tree)
    np.testing.assert_array_equal(rebuilt["a"][1]["w"], np.ones(3))


def test_tolerant_restore_skips_mismatches():
    target = {"x": {"w": jnp.zeros((2, 2)), "b": jnp.zeros((2,))},
              "y": {"w": jnp.zeros((3,))}}
    msgs = []
    source = {
        "x.w": np.ones((2, 2)),          # restored
        "x.b": np.ones((5,)),            # shape mismatch -> skipped
        "ghost.w": np.ones((1,)),        # unknown key -> skipped
    }
    out = tolerant_restore(target, source, logging=msgs.append)
    np.testing.assert_array_equal(np.asarray(out["x"]["w"]), np.ones((2, 2)))
    np.testing.assert_array_equal(np.asarray(out["x"]["b"]), np.zeros(2))
    np.testing.assert_array_equal(np.asarray(out["y"]["w"]), np.zeros(3))
    assert any("Skipped: x.b" in m for m in msgs)
    assert any("ghost.w" in m for m in msgs)


def test_tolerant_restore_key_map():
    target = {"layers": [{"w": jnp.zeros((2,))}]}
    source = {"old_prefix.layers.0.w": np.ones((2,))}
    out = tolerant_restore(
        target, source,
        key_map=lambda k: k.replace("old_prefix.", ""))
    np.testing.assert_array_equal(np.asarray(out["layers"][0]["w"]),
                                  np.ones(2))


def test_lr_halving_schedule_matches_reference_semantics():
    """Reference halves *after* the update at steps k*lr_step (k>=1); so the
    update at count c runs at lr0 * 0.5**((c-1)//lr_step) for c >= 1."""
    lr0, lr_step = 1.0, 3
    sched = halving_schedule(lr0, lr_step)
    # reference simulation
    lr = lr0
    want = []
    for g in range(10):
        want.append(lr)
        if g % lr_step == 0 and g > 0:
            lr *= 0.5
    got = [float(sched(c)) for c in range(10)]
    assert got == want
    assert [current_lr(lr0, lr_step, c) for c in range(10)] == want


def test_optimizer_matches_torch_adam(rng):
    """One Adam(0.5, 0.999) update must match torch.optim.Adam."""
    import pytest
    torch = pytest.importorskip("torch")

    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    g = rng.standard_normal((4, 3)).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([tw], lr=1e-3, betas=(0.5, 0.999))
    tw.grad = torch.from_numpy(g.copy())
    opt.step()
    opt.step()  # second update with same grad
    want = tw.detach().numpy()

    import optax
    optimizer = make_adam(1e-3)
    params = {"w": jnp.asarray(w0)}
    state = optimizer.init(params)
    for _ in range(2):
        updates, state = optimizer.update({"w": jnp.asarray(g)}, state,
                                          params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), want, atol=1e-6)


def test_fmap_dataset_with_images(tmp_path, rng):
    """FeatureMapDataset(load_image=True) returns (fmap, image-HWC) pairs —
    the reference's joint-load mode (feature_map_dataset.py:44-58)."""
    import pytest
    cv2 = pytest.importorskip("cv2")
    from qaig_tpu.data.manifest import write_manifest
    from qaig_tpu.data.fmap_dataset import FeatureMapDataset

    rows = []
    for i in range(3):
        fmap = rng.standard_normal((2, 4, 4)).astype(np.float32)
        fp = str(tmp_path / f"f{i}.npy")
        with open(fp, "wb") as f:
            np.save(f, fmap)
        img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        ip = str(tmp_path / f"i{i}.png")
        cv2.imwrite(ip, img)
        rows.append({"fmap_path": fp, "image_path": ip})
    manifest = str(tmp_path / "m.json")
    write_manifest(manifest, rows)

    ds = FeatureMapDataset(manifest, load_image=True)
    fmap, image = ds[1]
    assert fmap.shape == (2, 4, 4)
    assert image.shape == (8, 8, 3)  # HWC, reference keeps this layout
    assert image.min() >= -1.0 and image.max() <= 1.0


@pytest.mark.slow
def test_submodule_restore_from_autoencoder_checkpoint():
    """Loading the standalone FC decoder/encoder out of a composite
    autoencoder checkpoint must strip the ``fc_decoder./fc_encoder.``
    prefixes (reference ``FC_Decoder.py:68-91`` prefix-rewrite semantics) —
    a bare tolerant restore would silently keep random init."""
    import jax
    import jax.numpy as jnp
    from qaig_tpu.models.conv_nets import Autoencoder, AutoencoderConfig
    from qaig_tpu.train import common
    from qaig_tpu.train.fmap import encoder_from_checkpoint

    cfg = AutoencoderConfig(num_layers=1, image_channel=3, min_channel=4,
                            max_channel=8, latent_channel=2)
    ae = Autoencoder(cfg)
    ae_params = ae.init(jax.random.PRNGKey(1))
    ckpt = {
        "num_layers": 1, "image_channel": 3, "min_channel": 4,
        "max_channel": 8, "latent_channel": 2,
        "hidden_activation_type": "silu",
        "use_final_enc_activation": True, "encoder_activation_type": "tanh",
        "use_final_dec_activation": True, "decoder_activation_type": "tanh",
        "model": common.model_state_dict(ae_params),
    }

    skipped = []
    _, dec_params, _ = common.decoder_from_checkpoint(
        ckpt, logging=skipped.append)
    want = ae_params["fc_decoder"]["layers"][0]["w"]
    np.testing.assert_array_equal(np.asarray(dec_params["layers"][0]["w"]),
                                  np.asarray(want))
    assert not skipped, skipped  # every decoder leaf must land

    skipped = []
    _, enc_params, _ = encoder_from_checkpoint(ckpt, logging=skipped.append)
    want = ae_params["fc_encoder"]["layers"][0]["w"]
    np.testing.assert_array_equal(np.asarray(enc_params["layers"][0]["w"]),
                                  np.asarray(want))
    assert not skipped, skipped


def test_orbax_sharded_save_and_mesh_restore(tmp_path):
    """TP-sharded params save shard-wise through orbax (no host gather) and
    restore directly onto a mesh with their partition specs; async save
    completes in the background."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qaig_tpu.models.transformer import Transformer, TransformerConfig
    from qaig_tpu.parallel.mesh import make_mesh
    from qaig_tpu.parallel.sharding import transformer_param_spec, shard_tree
    from qaig_tpu.utils.checkpoint import (flatten_tree, save_model_orbax,
                                           restore_arrays_orbax)

    cfg = TransformerConfig(
        use_encoder=False, use_pos_cond=False, num_enc_layers=0,
        num_dec_layers=2, num_enc_embedding=1, num_dec_embedding=16,
        self_attn_heads=2, cross_attn_heads=0, in_dim=16, out_dim=12,
        hidden_dim=32)
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=4, n_model=2)
    spec = transformer_param_spec(params)
    params_s = shard_tree(mesh, params, spec)

    ckpt = {"kind": "test", "model": params_s}
    ckptr = save_model_orbax(ckpt, dest_path=tmp_path, file_name="tp",
                             async_save=True)
    assert ckptr is not False
    ckptr.wait_until_finished()

    flat_spec = {f"model.{k}": NamedSharding(mesh, v)
                 for k, v in flatten_tree(spec).items()}
    ok, arrays = restore_arrays_orbax(
        str(tmp_path / "models_checkpoint" / "tp.orbax"), flat_spec)
    assert ok
    want_flat = flatten_tree(params_s)
    for key, want in want_flat.items():
        got = arrays[f"model.{key}"]
        # restored straight onto the mesh with the original partitioning
        assert got.sharding == NamedSharding(mesh, flatten_tree(spec)[key])
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_save_model_orbax_backend_roundtrip(tmp_path):
    """save_model(backend='orbax') + load_model on the .orbax directory
    preserve the reference checkpoint schema."""
    import jax.numpy as jnp
    from qaig_tpu.utils.checkpoint import save_model, load_model

    ckpt = {"num_layers": 2, "hidden_activation_type": "silu",
            "model": {"layers.0.w": jnp.arange(6.0).reshape(2, 3)}}
    assert save_model(ckpt, dest_path=tmp_path, file_name="m.pt",
                      backend="orbax")
    ok, got = load_model(tmp_path / "models_checkpoint" / "m.pt.orbax")
    assert ok
    assert got["num_layers"] == 2
    assert got["hidden_activation_type"] == "silu"
    np.testing.assert_array_equal(np.asarray(got["model"]["layers.0.w"]),
                                  np.arange(6.0).reshape(2, 3))


def test_orbax_async_backend_cli(tmp_path):
    """--checkpoint-backend orbax-async end-to-end: saves are issued
    asynchronously during training (at most one write in flight) and the
    checkpoint is complete and loadable after the CLI's exit-time
    wait_pending_saves()."""
    import pytest
    pytest.importorskip("orbax.checkpoint")
    import json
    import cv2
    from qaig_tpu.data.manifest import write_manifest
    from qaig_tpu.train import autoencoder
    from qaig_tpu.utils.checkpoint import (load_model,
                                           _pending_async_saves)

    rng2 = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    for i in range(8):
        p = str(img_dir / f"{i}.png")
        cv2.imwrite(p, rng2.integers(0, 255, (8, 8, 3), dtype=np.uint8))
        rows.append({"image_fpath": p, "labels": []})
    write_manifest(str(tmp_path / "dataset.json"), rows)
    cfg = {"model_lr": 1e-3, "image_channel": 3, "min_channel": 4,
           "max_channel": 8, "num_layers": 1, "latent_channel": 2,
           "hidden_activation_type": "silu",
           "use_final_enc_activation": True,
           "encoder_activation_type": "silu",
           "use_final_dec_activation": True,
           "decoder_activation_type": "tanh"}
    with open(tmp_path / "ae.json", "w") as f:
        json.dump(cfg, f)

    autoencoder.run({
        "device": "cpu",
        "dataset_path": str(tmp_path / "dataset.json"),
        "config_path": str(tmp_path / "ae.json"),
        "out_dir": str(tmp_path / "out"),
        "batch_size": 4, "checkpoint_step": 2, "max_steps": 3,
        "checkpoint_backend": "orbax-async",
    })
    assert not _pending_async_saves  # drained at exit
    for step in (0, 2):
        ok, ckpt = load_model(
            tmp_path / "out" / "models_checkpoint" / f"model_{step}.pt.orbax")
        assert ok and "model" in ckpt and ckpt["num_layers"] == 1
