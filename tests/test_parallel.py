"""Sharded training on the virtual 8-device CPU mesh.

DP and DP+TP runs of the transformer train step must match the
single-device result (same math, different layout).
"""

import pytest

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from qaig_tpu.models.codebook import Codebook
from qaig_tpu.models.transformer import Transformer, TransformerConfig
from qaig_tpu.parallel.mesh import make_mesh
from qaig_tpu.parallel.sharding import (batch_sharding, shard_tree,
                                        transformer_param_spec)
from qaig_tpu.train.optim import make_adam
from qaig_tpu.train.transformer import make_train_step


def _setup(sliding_window=None):
    lr_cb = Codebook(patch_dim=(8, 8), image_dim=(8, 8), image_channel=2,
                     num_embeddings=8, init_neighbour_range=4)
    hr_cb = Codebook(patch_dim=(2, 2), image_dim=(8, 8), image_channel=2,
                     num_embeddings=16, init_neighbour_range=8)
    cfg = TransformerConfig(
        use_encoder=True, use_pos_cond=sliding_window is not None,
        num_enc_layers=1, num_dec_layers=2, num_enc_embedding=8,
        num_dec_embedding=17, self_attn_heads=2, cross_attn_heads=2,
        in_dim=16, out_dim=17, hidden_dim=32, hidden_activation="silu")
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = make_adam(1e-3, 100)
    opt_state = optimizer.init(params)
    lr_params = lr_cb.init(jax.random.PRNGKey(1))
    hr_params = hr_cb.init(jax.random.PRNGKey(2))
    step = make_train_step(model, optimizer, lr_cb, hr_cb,
                           train_base_model=False, lr_num_embeddings=8,
                           hr_num_embeddings=16,
                           sliding_window=sliding_window)
    return step, params, opt_state, lr_params, hr_params


@pytest.mark.slow
def test_dp_tp_matches_single_device(rng):
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    batch = 8
    fmap = jnp.asarray(rng.standard_normal((batch, 2, 8, 8)), jnp.float32)
    key = jax.random.PRNGKey(3)

    step, params, opt_state, lr_params, hr_params = _setup()
    ref_params, _, ref_loss = step(params, opt_state,
                                   (lr_params, hr_params), fmap, key)
    ref_loss = float(ref_loss)
    ref_leaf = np.asarray(
        ref_params["decoder_layers"][0]["ffn"]["ff"]["l0"]["w"])

    for n_data, n_model in ((8, 1), (4, 2)):
        # make_train_step donates its inputs; rebuild fresh state per mesh
        step_i, params_i, opt_i, lr_p, hr_p = _setup()
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        with mesh:
            spec = transformer_param_spec(params_i)
            params_s = shard_tree(mesh, params_i, spec)
            opt_s = jax.device_put(opt_i, NamedSharding(mesh, P()))
            lr_s = jax.device_put(lr_p, NamedSharding(mesh, P()))
            hr_s = jax.device_put(hr_p, NamedSharding(mesh, P()))
            fmap_s = jax.device_put(fmap, batch_sharding(mesh, ndim=4))
            new_params, _, loss = step_i(params_s, opt_s, (lr_s, hr_s),
                                         fmap_s, key)
        assert abs(float(loss) - ref_loss) < 1e-5, (n_data, n_model)
        got_leaf = np.asarray(
            new_params["decoder_layers"][0]["ffn"]["ff"]["l0"]["w"])
        np.testing.assert_allclose(got_leaf, ref_leaf, atol=1e-5,
                                   err_msg=f"mesh {n_data}x{n_model}")


@pytest.mark.slow
def test_zero1_matches_single_device(rng):
    """ZeRO-1 (--zero-opt): Adam moments sharded over 'data' (composing
    with TP on the 4x2 mesh), grads reduce-scattered, params
    all-gathered — must be step-exact vs the unsharded run, and the
    moment leaves must actually live sharded."""
    from qaig_tpu.parallel.sharding import (shard_opt_state, zero_opt_spec)

    batch = 8
    fmap = jnp.asarray(rng.standard_normal((batch, 2, 8, 8)), jnp.float32)
    key = jax.random.PRNGKey(3)

    step, params, opt_state, lr_params, hr_params = _setup()
    ref_params, ref_opt, ref_loss = step(params, opt_state,
                                         (lr_params, hr_params), fmap, key)
    ref_loss = float(ref_loss)
    ref_leaf = np.asarray(
        ref_params["decoder_layers"][0]["ffn"]["ff"]["l0"]["w"])
    ref_mu = np.asarray(
        ref_opt[0].mu["decoder_layers"][0]["ffn"]["ff"]["l0"]["w"])

    for n_data, n_model in ((8, 1), (4, 2)):
        _, params_i, opt_i, lr_p, hr_p = _setup()
        lr_cb = Codebook(patch_dim=(8, 8), image_dim=(8, 8), image_channel=2,
                         num_embeddings=8, init_neighbour_range=4)
        hr_cb = Codebook(patch_dim=(2, 2), image_dim=(8, 8), image_channel=2,
                         num_embeddings=16, init_neighbour_range=8)
        model = Transformer(TransformerConfig(
            use_encoder=True, use_pos_cond=False, num_enc_layers=1,
            num_dec_layers=2, num_enc_embedding=8, num_dec_embedding=17,
            self_attn_heads=2, cross_attn_heads=2, in_dim=16, out_dim=17,
            hidden_dim=32, hidden_activation="silu"))
        optimizer = make_adam(1e-3, 100)
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        spec = transformer_param_spec(params_i)
        mspec = zero_opt_spec(params_i, spec, n_data)
        # the big MLP leaves must pick up a 'data' dim on top of TP
        l0 = mspec["decoder_layers"][0]["ffn"]["ff"]["l0"]["w"]
        assert "data" in l0, l0
        if n_model > 1:
            assert "model" in l0, l0
        params_s = shard_tree(mesh, params_i, spec)
        opt_s = shard_opt_state(mesh, optimizer, opt_i, spec,
                                moment_spec=mspec)
        step_z = make_train_step(
            model, optimizer, lr_cb, hr_cb, train_base_model=False,
            lr_num_embeddings=8, hr_num_embeddings=16,
            zero_shards=(mesh, spec, mspec))
        lr_s = jax.device_put(lr_p, NamedSharding(mesh, P()))
        hr_s = jax.device_put(hr_p, NamedSharding(mesh, P()))
        fmap_s = jax.device_put(fmap, batch_sharding(mesh, ndim=4))
        new_params, new_opt, loss = step_z(params_s, opt_s, (lr_s, hr_s),
                                           fmap_s, key)
        assert abs(float(loss) - ref_loss) < 1e-5, (n_data, n_model)
        got_leaf = np.asarray(
            new_params["decoder_layers"][0]["ffn"]["ff"]["l0"]["w"])
        np.testing.assert_allclose(got_leaf, ref_leaf, atol=1e-5,
                                   err_msg=f"zero mesh {n_data}x{n_model}")
        mu_leaf = new_opt[0].mu["decoder_layers"][0]["ffn"]["ff"]["l0"]["w"]
        # moments stay ZeRO-sharded across steps and match the reference
        assert "data" in mu_leaf.sharding.spec, mu_leaf.sharding
        shard_elems = np.prod(mu_leaf.addressable_shards[0].data.shape)
        assert shard_elems <= np.prod(mu_leaf.shape) // n_data
        np.testing.assert_allclose(np.asarray(mu_leaf), ref_mu, atol=1e-6,
                                   err_msg=f"mu mesh {n_data}x{n_model}")


@pytest.mark.slow
def test_grad_accum_matches_full_batch(rng):
    """--grad-accum: N sequential chunks + one Adam update must reproduce
    the full-batch step (equal chunks make mean-of-means == full mean),
    both single-device and with the chunk batch sharded over 'data'."""
    batch = 8
    fmap = jnp.asarray(rng.standard_normal((batch, 2, 8, 8)), jnp.float32)
    key = jax.random.PRNGKey(3)

    step, params, opt_state, lr_params, hr_params = _setup()
    ref_params, _, ref_loss = step(params, opt_state,
                                   (lr_params, hr_params), fmap, key)
    ref_loss = float(ref_loss)
    ref_leaf = np.asarray(
        ref_params["decoder_layers"][0]["ffn"]["ff"]["l0"]["w"])

    def make(accum, mesh=None, sliding_window=None):
        lr_cb = Codebook(patch_dim=(8, 8), image_dim=(8, 8), image_channel=2,
                         num_embeddings=8, init_neighbour_range=4)
        hr_cb = Codebook(patch_dim=(2, 2), image_dim=(8, 8), image_channel=2,
                         num_embeddings=16, init_neighbour_range=8)
        model = Transformer(TransformerConfig(
            use_encoder=True, use_pos_cond=sliding_window is not None,
            num_enc_layers=1, num_dec_layers=2, num_enc_embedding=8,
            num_dec_embedding=17, self_attn_heads=2, cross_attn_heads=2,
            in_dim=16, out_dim=17, hidden_dim=32, hidden_activation="silu"))
        optimizer = make_adam(1e-3, 100)
        step_a = make_train_step(
            model, optimizer, lr_cb, hr_cb, train_base_model=False,
            lr_num_embeddings=8, hr_num_embeddings=16,
            sliding_window=sliding_window, grad_accum=accum,
            accum_mesh=mesh)
        return (step_a, model.init(jax.random.PRNGKey(0)),
                optimizer.init(model.init(jax.random.PRNGKey(0))))

    # single-device, accum over 2 and 4 chunks
    for accum in (2, 4):
        step_a, params_a, opt_a = make(accum)
        new_p, _, loss = step_a(params_a, opt_a, (lr_params, hr_params),
                                fmap, key)
        assert abs(float(loss) - ref_loss) < 1e-5, accum
        np.testing.assert_allclose(
            np.asarray(new_p["decoder_layers"][0]["ffn"]["ff"]["l0"]["w"]),
            ref_leaf, atol=1e-5, err_msg=f"accum={accum}")

    # sharded: 4-chunk accumulation, each 2-sample chunk over a data=2 mesh
    mesh = make_mesh(n_data=2, n_model=2)
    step_a, params_a, opt_a = make(4, mesh=mesh)
    spec = transformer_param_spec(params_a)
    params_s = shard_tree(mesh, params_a, spec)
    opt_s = jax.device_put(opt_a, NamedSharding(mesh, P()))
    lr_s = jax.device_put(lr_params, NamedSharding(mesh, P()))
    hr_s = jax.device_put(hr_params, NamedSharding(mesh, P()))
    fmap_s = jax.device_put(fmap, batch_sharding(mesh, ndim=4))
    new_p, _, loss = step_a(params_s, opt_s, (lr_s, hr_s), fmap_s, key)
    assert abs(float(loss) - ref_loss) < 1e-5
    np.testing.assert_allclose(
        np.asarray(new_p["decoder_layers"][0]["ffn"]["ff"]["l0"]["w"]),
        ref_leaf, atol=1e-5, err_msg="sharded accum")

    # sliding-window path: windows drawn on the FULL batch before
    # chunking, so accumulation must still match the full-batch windowed
    # step bit-for-bit
    step_w, params_w, opt_w, lr_w, hr_w = _setup(sliding_window=8)
    ref_wp, _, ref_wloss = step_w(params_w, opt_w, (lr_w, hr_w), fmap, key)
    step_wa, params_wa, opt_wa = make(2, sliding_window=8)
    new_wp, _, wloss = step_wa(params_wa, opt_wa, (lr_w, hr_w), fmap, key)
    assert abs(float(wloss) - float(ref_wloss)) < 1e-5
    np.testing.assert_allclose(
        np.asarray(new_wp["decoder_layers"][0]["ffn"]["ff"]["l0"]["w"]),
        np.asarray(ref_wp["decoder_layers"][0]["ffn"]["ff"]["l0"]["w"]),
        atol=1e-5, err_msg="windowed accum")


@pytest.mark.slow
def test_autoencoder_grad_accum_zero_matches(rng):
    """The AE stage's --grad-accum / --zero-opt combination must match the
    plain single-device step (same contracts as the transformer stage)."""
    from qaig_tpu.models.conv_nets import Autoencoder, AutoencoderConfig
    from qaig_tpu.parallel.sharding import shard_opt_state, zero_opt_spec
    from qaig_tpu.train import autoencoder as ae_stage

    cfg = AutoencoderConfig(
        num_layers=1, image_channel=3, min_channel=8, max_channel=16,
        latent_channel=2, hidden_activation_type="silu",
        use_final_enc_activation=True, encoder_activation_type="tanh",
        use_final_dec_activation=True, decoder_activation_type="tanh")
    model = Autoencoder(cfg)
    optimizer = make_adam(1e-3, 100)
    batch = jnp.asarray(rng.uniform(-1, 1, (8, 3, 8, 8)), jnp.float32)

    params = model.init(jax.random.PRNGKey(0))
    step = ae_stage.make_train_step(model, optimizer)
    ref_p, _, ref_loss = step(params, optimizer.init(params), batch)
    ref_leaf = np.asarray(jax.tree_util.tree_leaves(ref_p)[0])

    mesh = make_mesh(n_data=4, n_model=1)
    params_z = model.init(jax.random.PRNGKey(0))
    pspec = jax.tree_util.tree_map(lambda _: P(), params_z)
    mspec = zero_opt_spec(params_z, pspec, 4)
    params_s = shard_tree(mesh, params_z)
    opt_s = shard_opt_state(mesh, optimizer, optimizer.init(params_z),
                            pspec, moment_spec=mspec)
    step_z = ae_stage.make_train_step(
        model, optimizer, grad_accum=2, accum_mesh=mesh,
        zero_shards=(mesh, pspec, mspec))
    new_p, new_opt, loss = step_z(
        params_s, opt_s, jax.device_put(batch, batch_sharding(mesh, ndim=4)))
    assert abs(float(loss) - float(ref_loss)) < 1e-5
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(new_p)[0]), ref_leaf,
        atol=1e-5)
    # at least one moment leaf must be data-sharded
    mu_leaves = jax.tree_util.tree_leaves(new_opt[0].mu)
    assert any("data" in l.sharding.spec for l in mu_leaves
               if hasattr(l.sharding, "spec"))


@pytest.mark.slow
def test_sliding_window_step_on_mesh(rng):
    """Windowed training step compiles and runs sharded."""
    step, params, opt_state, lr_params, hr_params = _setup(sliding_window=8)
    mesh = make_mesh(n_data=4, n_model=2)
    batch = 8
    fmap = jnp.asarray(rng.standard_normal((batch, 2, 8, 8)), jnp.float32)
    with mesh:
        spec = transformer_param_spec(params)
        params = shard_tree(mesh, params, spec)
        opt_state = jax.device_put(opt_state, NamedSharding(mesh, P()))
        lr_params = jax.device_put(lr_params, NamedSharding(mesh, P()))
        hr_params = jax.device_put(hr_params, NamedSharding(mesh, P()))
        fmap = jax.device_put(fmap, batch_sharding(mesh, ndim=4))
        _, _, loss = step(params, opt_state, (lr_params, hr_params), fmap,
                          jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))


def test_sharded_batch_decode_matches_single_device(rng):
    """Generation with the batch sharded over an 8-device data mesh (params
    replicated) must produce the same tokens as the single-device run —
    the product path in ``infer/generate.py``/``CascadePipeline``."""
    from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings
    from qaig_tpu.infer.generate import make_decode_mesh, shard_decode_inputs

    cfg = TransformerConfig(
        use_encoder=True, use_pos_cond=False, num_enc_layers=1,
        num_dec_layers=2, num_enc_embedding=8, num_dec_embedding=17,
        self_attn_heads=2, cross_attn_heads=2, in_dim=16, out_dim=17,
        hidden_dim=32, hidden_activation="silu")
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0))

    n = 8
    init = jnp.full((n, 1), 16, jnp.int32)
    x_enc = jnp.asarray(rng.integers(0, 8, (n, 4)), jnp.int32)
    settings = SamplerSettings(temperature=1.0, end_token=16,
                               end_mode="mask", index_shift=0)
    key = jax.random.PRNGKey(11)

    want = np.asarray(DecodeEngine(model).rollout_generate(
        params, init, 16, key, settings, num_beam=2, beam_width=4,
        x_enc=x_enc))

    mesh = make_decode_mesh(n)
    assert mesh.shape["data"] == 8
    params_s, init_s, x_enc_s = shard_decode_inputs(mesh, params, init,
                                                    x_enc)
    got = DecodeEngine(model).rollout_generate(
        params_s, init_s, 16, key, settings, num_beam=2, beam_width=4,
        x_enc=x_enc_s)
    # the decoded batch must actually live sharded on the mesh
    assert len(got.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(got), want)


def test_mesh_idle_device_warning(caplog):
    """make_mesh_for_batch must say so when indivisible batches idle chips
    (it used to silently run 25-image jobs on 5 of 8 devices)."""
    import logging
    from qaig_tpu.parallel.mesh import make_mesh_for_batch

    with caplog.at_level(logging.WARNING, logger="qaig_tpu"):
        mesh = make_mesh_for_batch(3)  # 3 of 8 virtual devices
    assert mesh.shape["data"] == 3
    assert any("idle" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="qaig_tpu"):
        mesh = make_mesh_for_batch(16)  # all 8 devices, no warning
    assert mesh.shape["data"] == 8
    assert not caplog.records


@pytest.mark.slow
def test_tp_sharded_decode_matches_single_device(rng):
    """Tensor-parallel generation (data=4 x model=2: Megatron MLP sharding
    via transformer_param_spec, the --num-model-shards inference path) must
    produce the same tokens as the single-device run — including through a
    sliding-window crossing segment."""
    from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings
    from qaig_tpu.infer.generate import make_decode_mesh, shard_decode_inputs

    cfg = TransformerConfig(
        use_encoder=True, use_pos_cond=True, num_enc_layers=1,
        num_dec_layers=2, num_enc_embedding=8, num_dec_embedding=17,
        self_attn_heads=2, cross_attn_heads=2, in_dim=16, out_dim=17,
        hidden_dim=32, hidden_activation="silu")
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0))

    n, window = 8, 8
    init = jnp.full((n, 1), 16, jnp.int32)
    x_enc = jnp.asarray(rng.integers(0, 8, (n, 4)), jnp.int32)
    settings = SamplerSettings(temperature=1.0, end_token=16,
                               end_mode="mask", index_shift=0, pos_offset=1)
    key = jax.random.PRNGKey(11)

    want = np.asarray(DecodeEngine(model).rollout_generate(
        params, init, 16, key, settings, num_beam=2, beam_width=4,
        x_enc=x_enc, sliding_window=window))

    mesh = make_decode_mesh(n, n_model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    params_s, init_s, x_enc_s = shard_decode_inputs(mesh, params, init,
                                                    x_enc)
    # the MLP weights must actually live sharded over the model axis
    l0w = params_s["decoder_layers"][0]["self_attn"]["attn"]["q"]["l0"]["w"]
    assert not l0w.sharding.is_fully_replicated
    got = DecodeEngine(model).rollout_generate(
        params_s, init_s, 16, key, settings, num_beam=2, beam_width=4,
        x_enc=x_enc_s, sliding_window=window)
    assert len(got.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(got), want)
