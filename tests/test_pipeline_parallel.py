"""Pipeline parallelism (qaig_tpu/parallel/pipeline.py) on the virtual
8-device CPU mesh.

The GPipe-scheduled decoder stack must match the plain forward exactly —
logits, grads, and whole train steps — and the stacked<->list param
conversions must round-trip params and optimizer states (the checkpoint
schema stays per-layer-list).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from qaig_tpu.models.codebook import Codebook
from qaig_tpu.models.transformer import Transformer, TransformerConfig
from qaig_tpu.parallel import pipeline
from qaig_tpu.parallel.mesh import make_mesh
from qaig_tpu.parallel.sharding import batch_sharding, shard_tree
from qaig_tpu.train.optim import make_adam
from qaig_tpu.train.transformer import make_train_step


def _cascade_model(num_dec_layers=4):
    cfg = TransformerConfig(
        use_encoder=True, use_pos_cond=True, num_enc_layers=1,
        num_dec_layers=num_dec_layers, num_enc_embedding=8,
        num_dec_embedding=17, self_attn_heads=2, cross_attn_heads=2,
        in_dim=16, out_dim=17, hidden_dim=32, hidden_activation="silu")
    model = Transformer(cfg)
    return model, model.init(jax.random.PRNGKey(0))


def _inputs(rng, n=8, seq=12):
    x_dec = jnp.asarray(rng.integers(0, 17, (n, seq)), jnp.int32)
    x_enc = jnp.asarray(rng.integers(0, 8, (n, 4)), jnp.int32)
    pos = jnp.asarray(rng.integers(0, seq + 1, (n, seq)), jnp.int32)
    return x_dec, x_enc, pos


@pytest.mark.slow
def test_pipelined_apply_matches_apply(rng):
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    model, params = _cascade_model(num_dec_layers=4)
    x_dec, x_enc, pos = _inputs(rng)
    want = np.asarray(model.apply(params, x_dec, x_enc=x_enc, pos_cond=pos))

    for n_data, n_pipe, mb in ((2, 4, 2), (2, 4, 4), (1, 2, 8)):
        mesh = make_mesh(n_data=n_data, n_pipe=n_pipe)
        got = jax.jit(lambda p: pipeline.pipelined_apply(
            model, p, x_dec, x_enc=x_enc, pos_cond=pos, mesh=mesh,
            num_microbatches=mb))(params)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5,
                                   err_msg=f"mesh {n_data}x{n_pipe} M={mb}")


def test_pipelined_apply_base_model(rng):
    """Decoder-only (no encoder, no pos-cond) through the pipeline."""
    cfg = TransformerConfig(
        use_encoder=False, use_pos_cond=False, num_dec_layers=2,
        num_dec_embedding=24, self_attn_heads=2, in_dim=16, out_dim=17,
        hidden_dim=32, hidden_activation="silu")
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x_dec = jnp.asarray(rng.integers(0, 24, (8, 10)), jnp.int32)

    want = np.asarray(model.apply(params, x_dec))
    mesh = make_mesh(n_data=2, n_pipe=2)
    got = jax.jit(lambda p: pipeline.pipelined_apply(
        model, p, x_dec, mesh=mesh, num_microbatches=4))(params)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.slow
def test_pipelined_grads_match(rng):
    """value_and_grad through the pipeline == plain path, for the stacked
    stage-local layers AND the replicated embeddings/encoder/classifier
    (whose cotangents shard_map's transpose must psum over 'pipe')."""
    model, params = _cascade_model(num_dec_layers=4)
    x_dec, x_enc, pos = _inputs(rng)
    tgt = jnp.asarray(rng.integers(0, 17, x_dec.shape), jnp.int32)

    def loss_from(logits):
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits.reshape(-1, 17), tgt.reshape(-1)))

    l0, g0 = jax.value_and_grad(
        lambda p: loss_from(model.apply(p, x_dec, x_enc=x_enc,
                                        pos_cond=pos)))(params)

    mesh = make_mesh(n_data=2, n_pipe=4)
    stacked = pipeline.stack_params(params)
    l1, g1 = jax.jit(jax.value_and_grad(
        lambda p: loss_from(pipeline.pipelined_apply(
            model, p, x_dec, x_enc=x_enc, pos_cond=pos, mesh=mesh,
            num_microbatches=2))))(stacked)

    assert abs(float(l0) - float(l1)) < 1e-6
    g1 = pipeline.unstack_params(g1, 4)
    assert jax.tree_util.tree_structure(g0) == \
        jax.tree_util.tree_structure(g1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6), g0, g1)


@pytest.mark.slow
def test_pp_train_step_matches_single_device(rng):
    """Two full PP train steps (tokenize + window + fwd/bwd + Adam) must
    match the unpipelined single-device result."""
    lr_cb = Codebook(patch_dim=(8, 8), image_dim=(8, 8), image_channel=2,
                     num_embeddings=8, init_neighbour_range=4)
    hr_cb = Codebook(patch_dim=(2, 2), image_dim=(8, 8), image_channel=2,
                     num_embeddings=16, init_neighbour_range=8)

    def setup(mesh=None, mb=None):
        cfg = TransformerConfig(
            use_encoder=True, use_pos_cond=True, num_enc_layers=1,
            num_dec_layers=2, num_enc_embedding=8, num_dec_embedding=17,
            self_attn_heads=2, cross_attn_heads=2, in_dim=16, out_dim=17,
            hidden_dim=32, hidden_activation="silu")
        model = Transformer(cfg)
        params = model.init(jax.random.PRNGKey(0))
        optimizer = make_adam(1e-3, 100)
        opt_state = optimizer.init(params)
        if mesh is not None:
            params = pipeline.stack_params(params)
            opt_state = pipeline.stack_params(opt_state)
        step = make_train_step(model, optimizer, lr_cb, hr_cb,
                               train_base_model=False, lr_num_embeddings=8,
                               hr_num_embeddings=16, sliding_window=8,
                               pipeline_mesh=mesh, num_microbatches=mb)
        return step, params, opt_state

    batch = 8
    fmap = jnp.asarray(rng.standard_normal((batch, 2, 8, 8)), jnp.float32)
    lr_params = lr_cb.init(jax.random.PRNGKey(1))
    hr_params = hr_cb.init(jax.random.PRNGKey(2))
    keys = [jax.random.PRNGKey(3), jax.random.PRNGKey(4)]

    step, params, opt_state = setup()
    for k in keys:
        params, opt_state, loss = step(params, opt_state,
                                       (lr_params, hr_params), fmap, k)
    ref_loss = float(loss)
    ref_leaf = np.asarray(
        params["decoder_layers"][1]["ffn"]["ff"]["l0"]["w"])
    ref_cls = np.asarray(params["classifier"]["l0"]["w"])

    mesh = make_mesh(n_data=2, n_pipe=2)
    step_p, params_p, opt_p = setup(mesh=mesh, mb=2)
    spec = pipeline.pipeline_param_spec(params_p)
    params_p = shard_tree(mesh, params_p, spec)
    fmap_s = jax.device_put(fmap, batch_sharding(mesh, ndim=4))
    for k in keys:
        params_p, opt_p, loss_p = step_p(params_p, opt_p,
                                         (lr_params, hr_params), fmap_s, k)

    # the stage-local layer stacks must actually live sharded over 'pipe'
    stack_leaf = params_p["decoder_layers"]["ffn"]["ff"]["l0"]["w"]
    assert not stack_leaf.sharding.is_fully_replicated

    assert abs(float(loss_p) - ref_loss) < 1e-5
    got = pipeline.unstack_params(params_p, 2)
    np.testing.assert_allclose(
        np.asarray(got["decoder_layers"][1]["ffn"]["ff"]["l0"]["w"]),
        ref_leaf, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["classifier"]["l0"]["w"]),
                               ref_cls, atol=1e-5)


@pytest.mark.slow
def test_pp_tp_composed_train_step_matches_single_device(rng):
    """PP x TP on one data=2 x pipe=2 x model=2 mesh: decoder stacks
    'pipe'-sharded on the layer axis AND Megatron-'model'-sharded on their
    MLP dims (the shard_map leaves 'model' to GSPMD).  Must reproduce the
    unsharded train step."""
    lr_cb = Codebook(patch_dim=(8, 8), image_dim=(8, 8), image_channel=2,
                     num_embeddings=8, init_neighbour_range=4)
    hr_cb = Codebook(patch_dim=(2, 2), image_dim=(8, 8), image_channel=2,
                     num_embeddings=16, init_neighbour_range=8)
    cfg = TransformerConfig(
        use_encoder=True, use_pos_cond=True, num_enc_layers=1,
        num_dec_layers=2, num_enc_embedding=8, num_dec_embedding=17,
        self_attn_heads=2, cross_attn_heads=2, in_dim=16, out_dim=17,
        hidden_dim=32, hidden_activation="silu")
    model = Transformer(cfg)
    optimizer = make_adam(1e-3, 100)
    lr_params = lr_cb.init(jax.random.PRNGKey(1))
    hr_params = hr_cb.init(jax.random.PRNGKey(2))
    fmap = jnp.asarray(rng.standard_normal((8, 2, 8, 8)), jnp.float32)
    key = jax.random.PRNGKey(3)

    def make(mesh=None, mb=None):
        return make_train_step(model, optimizer, lr_cb, hr_cb, False, 8, 16,
                               sliding_window=8, pipeline_mesh=mesh,
                               num_microbatches=mb)

    params = model.init(jax.random.PRNGKey(0))
    step = make()
    ref_p, _, ref_loss = step(params, optimizer.init(params),
                              (lr_params, hr_params), fmap, key)
    want = np.asarray(ref_p["decoder_layers"][1]["ffn"]["ff"]["l0"]["w"])

    mesh = make_mesh(n_data=2, n_pipe=2, n_model=2)
    params_p = pipeline.stack_params(model.init(jax.random.PRNGKey(0)))
    spec = pipeline.pipeline_param_spec(params_p)
    # MLP leaves must be sharded over BOTH pipe and model
    assert spec["decoder_layers"]["ffn"]["ff"]["l0"]["w"] == \
        jax.sharding.PartitionSpec("pipe", None, "model")
    params_p = shard_tree(mesh, params_p, spec)
    from qaig_tpu.parallel.sharding import shard_opt_state
    opt_p = shard_opt_state(mesh, optimizer,
                            pipeline.stack_params(
                                optimizer.init(model.init(
                                    jax.random.PRNGKey(0)))), spec)
    step_p = make(mesh=mesh, mb=2)
    new_p, _, loss_p = step_p(params_p, opt_p, (lr_params, hr_params),
                              jax.device_put(fmap,
                                             batch_sharding(mesh, ndim=4)),
                              key)
    assert abs(float(loss_p) - float(ref_loss)) < 1e-5
    got = pipeline.unstack_params(new_p, 2)
    np.testing.assert_allclose(
        np.asarray(got["decoder_layers"][1]["ffn"]["ff"]["l0"]["w"]),
        want, atol=1e-5)


@pytest.mark.skipif(
    jax.default_backend() != "tpu" or len(jax.devices()) < 8,
    reason="bf16 + PP x TP needs a multi-chip TPU backend (the rejection "
           "this exercises the absence of is XLA:CPU-only)")
def test_pp_tp_bf16_train_step_runs_on_tpu(rng):
    """Flagship precision composes with the full parallelism stack on TPU:
    the bf16 PP x TP step (the combination validate_parallel_args rejects
    on the CPU backend because XLA:CPU aborts in AllReducePromotion) runs
    and tracks the unsharded bf16 step's loss."""
    lr_cb = Codebook(patch_dim=(8, 8), image_dim=(8, 8), image_channel=2,
                     num_embeddings=8, init_neighbour_range=4)
    hr_cb = Codebook(patch_dim=(2, 2), image_dim=(8, 8), image_channel=2,
                     num_embeddings=16, init_neighbour_range=8)
    cfg = TransformerConfig(
        use_encoder=True, use_pos_cond=False, num_enc_layers=1,
        num_dec_layers=2, num_enc_embedding=8, num_dec_embedding=17,
        self_attn_heads=2, cross_attn_heads=2, in_dim=16, out_dim=17,
        hidden_dim=32, hidden_activation="silu")
    model = Transformer(cfg)
    optimizer = make_adam(1e-3, 100)
    lr_params = lr_cb.init(jax.random.PRNGKey(1))
    hr_params = hr_cb.init(jax.random.PRNGKey(2))
    fmap = jnp.asarray(rng.standard_normal((8, 2, 8, 8)), jnp.float32)
    key = jax.random.PRNGKey(3)

    params = model.init(jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, lr_cb, hr_cb, False, 8, 16,
                           bf16=True)
    _, _, want = step(params, optimizer.init(params),
                      (lr_params, hr_params), fmap, key)

    mesh = make_mesh(n_data=2, n_pipe=2, n_model=2)
    params_p = pipeline.stack_params(model.init(jax.random.PRNGKey(0)))
    spec = pipeline.pipeline_param_spec(params_p)
    params_p = shard_tree(mesh, params_p, spec)
    from qaig_tpu.parallel.sharding import shard_opt_state
    opt_p = shard_opt_state(mesh, optimizer,
                            pipeline.stack_params(
                                optimizer.init(model.init(
                                    jax.random.PRNGKey(0)))), spec)
    step_p = make_train_step(model, optimizer, lr_cb, hr_cb, False, 8, 16,
                             bf16=True, pipeline_mesh=mesh,
                             num_microbatches=2)
    new_p, _, got = step_p(params_p, opt_p, (lr_params, hr_params),
                           jax.device_put(fmap,
                                          batch_sharding(mesh, ndim=4)),
                           key)
    assert np.isfinite(float(got))
    # bf16 rounding differs with the reduction layout; stay loose
    assert abs(float(got) - float(want)) < 5e-2
    assert pipeline.unstack_params(new_p, 2)[
        "classifier"]["l0"]["w"].dtype == jnp.float32


def test_parallel_arg_validation():
    """CLI flag validation for the PP/TP/bf16 combinations, including the
    CPU-backend-only rejection of bf16 + PP x TP (XLA:CPU aborts promoting
    bf16 all-reduces under the partially-manual mesh, so run() must raise a
    ValueError before compiling there; on TPU the combination is allowed —
    this suite runs on the forced-CPU conftest backend, so the raise path
    is what's exercised here)."""
    from qaig_tpu.train.transformer import validate_parallel_args
    cfg = TransformerConfig(
        use_encoder=False, num_dec_layers=4, num_dec_embedding=17,
        self_attn_heads=2, in_dim=16, out_dim=17, hidden_dim=32,
        hidden_activation="silu")

    assert validate_parallel_args(cfg, 8, {}) == (1, 1, None)
    assert validate_parallel_args(
        cfg, 8, {"num_pipeline_stages": 2}) == (1, 2, 2)
    # PP x TP composes in fp32
    assert validate_parallel_args(
        cfg, 8, {"num_pipeline_stages": 2, "num_model_shards": 2,
                 "num_microbatches": 4}) == (2, 2, 4)
    # bf16 works with PP alone and TP alone
    assert validate_parallel_args(
        cfg, 8, {"num_pipeline_stages": 2, "bf16": True}) == (1, 2, 2)
    assert validate_parallel_args(
        cfg, 8, {"num_model_shards": 2, "bf16": True}) == (2, 1, None)

    assert jax.default_backend() == "cpu"  # the rejection is CPU-gated
    with pytest.raises(ValueError, match="bf16"):
        validate_parallel_args(cfg, 8, {"num_pipeline_stages": 2,
                                        "num_model_shards": 2, "bf16": True})
    # ZeRO-1 shards moments over 'data'; PP already shards them over 'pipe'
    with pytest.raises(ValueError, match="zero-opt"):
        validate_parallel_args(cfg, 8, {"num_pipeline_stages": 2,
                                        "zero_opt": True})
    assert validate_parallel_args(
        cfg, 8, {"num_model_shards": 2, "zero_opt": True}) == (2, 1, None)
    # grad accumulation: must divide the batch; GPipe already microbatches
    assert validate_parallel_args(
        cfg, 8, {"grad_accum": 4, "num_model_shards": 2}) == (2, 1, None)
    with pytest.raises(ValueError, match="grad-accum"):
        validate_parallel_args(cfg, 9, {"grad_accum": 4})
    with pytest.raises(ValueError, match="grad-accum"):
        validate_parallel_args(cfg, 8, {"grad_accum": 2,
                                        "num_pipeline_stages": 2})
    with pytest.raises(ValueError, match="grad-accum"):
        validate_parallel_args(cfg, 8, {"grad_accum": 0})
    with pytest.raises(ValueError, match="hidden_dim"):
        validate_parallel_args(cfg, 8, {"num_model_shards": 3})
    with pytest.raises(ValueError, match="num_dec_layers"):
        validate_parallel_args(cfg, 8, {"num_pipeline_stages": 3})
    with pytest.raises(ValueError, match="batch size"):
        validate_parallel_args(cfg, 9, {"num_pipeline_stages": 2})
    with pytest.raises(ValueError, match="num-microbatches"):
        validate_parallel_args(cfg, 8, {"num_pipeline_stages": 2,
                                        "num_microbatches": 0})


@pytest.mark.slow
def test_pp_train_step_bf16(rng):
    """Mixed precision composes with the pipeline: the bf16 PP step runs
    and lands near the bf16 single-device loss."""
    lr_cb = Codebook(patch_dim=(8, 8), image_dim=(8, 8), image_channel=2,
                     num_embeddings=8, init_neighbour_range=4)
    hr_cb = Codebook(patch_dim=(2, 2), image_dim=(8, 8), image_channel=2,
                     num_embeddings=16, init_neighbour_range=8)
    cfg = TransformerConfig(
        use_encoder=True, use_pos_cond=False, num_enc_layers=1,
        num_dec_layers=2, num_enc_embedding=8, num_dec_embedding=17,
        self_attn_heads=2, cross_attn_heads=2, in_dim=16, out_dim=17,
        hidden_dim=32, hidden_activation="silu")
    model = Transformer(cfg)
    optimizer = make_adam(1e-3, 100)
    fmap = jnp.asarray(rng.standard_normal((8, 2, 8, 8)), jnp.float32)
    lr_params = lr_cb.init(jax.random.PRNGKey(1))
    hr_params = hr_cb.init(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(3)

    params = model.init(jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, lr_cb, hr_cb, False, 8, 16,
                           bf16=True)
    _, _, want = step(params, optimizer.init(params),
                      (lr_params, hr_params), fmap, key)

    mesh = make_mesh(n_data=2, n_pipe=2)
    params = pipeline.stack_params(model.init(jax.random.PRNGKey(0)))
    step_p = make_train_step(model, optimizer, lr_cb, hr_cb, False, 8, 16,
                             bf16=True, pipeline_mesh=mesh,
                             num_microbatches=2)
    new_p, _, got = step_p(params, optimizer.init(params),
                           (lr_params, hr_params), fmap, key)
    assert np.isfinite(float(got))
    # bf16 rounding differs with the reduction layout; stay loose
    assert abs(float(got) - float(want)) < 5e-2
    assert new_p["classifier"]["l0"]["w"].dtype == jnp.float32


def test_stack_unstack_roundtrip_params_and_opt_state():
    model, params = _cascade_model(num_dec_layers=4)
    optimizer = make_adam(1e-3, 100)
    opt_state = optimizer.init(params)

    for tree in (params, opt_state):
        stacked = pipeline.stack_params(tree)
        back = pipeline.unstack_params(stacked, 4)
        la = jax.tree_util.tree_leaves(tree)
        lb = jax.tree_util.tree_leaves(back)
        assert jax.tree_util.tree_structure(tree) == \
            jax.tree_util.tree_structure(back)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_pp_resume_from_plain_checkpoint_matches(rng):
    """The resume path run() uses under PP: train plain, round-trip params
    AND Adam state through the checkpoint representation, stack, continue
    pipelined — must equal training straight through unpipelined."""
    from qaig_tpu.train import common

    lr_cb = Codebook(patch_dim=(8, 8), image_dim=(8, 8), image_channel=2,
                     num_embeddings=8, init_neighbour_range=4)
    hr_cb = Codebook(patch_dim=(2, 2), image_dim=(8, 8), image_channel=2,
                     num_embeddings=16, init_neighbour_range=8)
    cfg = TransformerConfig(
        use_encoder=True, use_pos_cond=False, num_enc_layers=1,
        num_dec_layers=2, num_enc_embedding=8, num_dec_embedding=17,
        self_attn_heads=2, cross_attn_heads=2, in_dim=16, out_dim=17,
        hidden_dim=32, hidden_activation="silu")
    model = Transformer(cfg)
    optimizer = make_adam(1e-3, 100)
    lr_params = lr_cb.init(jax.random.PRNGKey(1))
    hr_params = hr_cb.init(jax.random.PRNGKey(2))
    fmap = jnp.asarray(rng.standard_normal((8, 2, 8, 8)), jnp.float32)
    keys = [jax.random.PRNGKey(k) for k in (3, 4, 5)]

    def make(mesh=None, mb=None):
        return make_train_step(model, optimizer, lr_cb, hr_cb, False, 8, 16,
                               pipeline_mesh=mesh, num_microbatches=mb)

    # straight through, unpipelined
    step = make()
    params = model.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    for k in keys:
        params, opt_state, _ = step(params, opt_state,
                                    (lr_params, hr_params), fmap, k)
    want = np.asarray(params["decoder_layers"][1]["ffn"]["ff"]["l0"]["w"])

    # 2 plain steps -> checkpoint round-trip -> stack -> 1 pipelined step
    step = make()
    params = model.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    for k in keys[:2]:
        params, opt_state, _ = step(params, opt_state,
                                    (lr_params, hr_params), fmap, k)
    saved_model = common.model_state_dict(params)
    saved_opt = common.gather_replicated(opt_state)

    fresh = model.init(jax.random.PRNGKey(7))
    restored = common.restore_model_state(model, fresh, saved_model,
                                          logging=lambda *a: None)
    restored_opt = common.restore_opt_state(
        model, restored, optimizer.init(fresh), saved_opt,
        logging=lambda *a: None)

    mesh = make_mesh(n_data=2, n_pipe=2)
    params_p = pipeline.stack_params(restored)
    opt_p = pipeline.stack_params(restored_opt)
    spec = pipeline.pipeline_param_spec(params_p)
    params_p = shard_tree(mesh, params_p, spec)
    step_p = make(mesh=mesh, mb=2)
    params_p, _, _ = step_p(params_p, opt_p, (lr_params, hr_params),
                            jax.device_put(fmap,
                                           batch_sharding(mesh, ndim=4)),
                            keys[2])
    got = pipeline.unstack_params(params_p, 2)
    np.testing.assert_allclose(
        np.asarray(got["decoder_layers"][1]["ffn"]["ff"]["l0"]["w"]),
        want, atol=1e-5)


def test_pipeline_validation_errors(rng):
    model, params = _cascade_model(num_dec_layers=4)
    x_dec, x_enc, pos = _inputs(rng)
    mesh = make_mesh(n_data=2, n_pipe=2)

    with pytest.raises(ValueError, match="not divisible by pipe"):
        m3, p3 = _cascade_model(num_dec_layers=3)
        pipeline.pipelined_apply(m3, p3, x_dec, x_enc=x_enc, pos_cond=pos,
                                 mesh=mesh, num_microbatches=2)
    with pytest.raises(ValueError, match="num_microbatches"):
        pipeline.pipelined_apply(model, params, x_dec, x_enc=x_enc,
                                 pos_cond=pos, mesh=mesh,
                                 num_microbatches=3)
    with pytest.raises(ValueError, match="data axis"):
        pipeline.pipelined_apply(model, params, x_dec, x_enc=x_enc,
                                 pos_cond=pos, mesh=mesh,
                                 num_microbatches=8)
