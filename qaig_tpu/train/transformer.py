"""Quantized-transformer training stage (base + cascade modes).

Parity with reference ``train_quantized_transformer.py:38-691``:

* on-the-fly BMU tokenization of each feature-map batch against the LR and
  HR codebooks,
* base mode: decoder-only over the combined LR+HR vocabulary, LR token(s)
  act as the <start> conditioning; cascade mode: encoder-decoder with a
  dedicated <start> token (= hr_K) and the LR tokens feeding the encoder,
* target = HR tokens + <end> (= hr_K),
* optional sliding window: one random window per sample with its absolute
  patch positions as AdaLN conditioning,
* Adam(0.5, 0.999), LR halving, NaN guard, reference checkpoint schema, and
  the checkpoint-time autoregressive image preview.

TPU-native: tokenization + window sampling + forward/backward/update run as
one jitted function (windows are per-sample ``dynamic_slice``s, not the
reference's materialize-all-windows ``unfold``); the preview decode uses the
KV-cached / windowed engines in ``qaig_tpu.infer.decode``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from qaig_tpu.data import FeatureMapDataset, DataLoader
from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings
from qaig_tpu.models.transformer import Transformer, TransformerConfig
from qaig_tpu.parallel import batch_sharding, shard_tree
from qaig_tpu.parallel import pipeline
from qaig_tpu.parallel.mesh import make_mesh_for_batch
from qaig_tpu.parallel.sharding import (constrain_opt_state,
                                        shard_opt_state,
                                        transformer_param_spec,
                                        zero_opt_spec)
from qaig_tpu.train import common, optim
from qaig_tpu.utils import save_model, load_model, save_images
from qaig_tpu.utils.checkpoint import wait_pending_saves
from qaig_tpu.utils.logging_utils import setup_logging

PROJECT_NAME = "Quantized Transformer"


def build_transformer_config(config_dict, train_base_model, lr_num_embeddings,
                             hr_num_embeddings, use_remat=False):
    """Vocabulary assembly parity with ``train_quantized_transformer.py:
    258-314``."""
    use_sliding_window = config_dict["use_sliding_window"]
    if train_base_model:
        num_enc_layers = 0
        num_enc_embedding = 0
        cross_attn_heads = 0
        num_dec_embedding = lr_num_embeddings + hr_num_embeddings
    else:
        num_enc_layers = config_dict["num_enc_layers"]
        num_enc_embedding = lr_num_embeddings
        cross_attn_heads = config_dict["cross_attn_heads"]
        num_dec_embedding = hr_num_embeddings + 1  # includes <start>

    return TransformerConfig(
        use_encoder=not train_base_model,
        use_pos_cond=use_sliding_window,
        num_enc_layers=num_enc_layers,
        num_dec_layers=config_dict["num_dec_layers"],
        num_enc_embedding=max(num_enc_embedding, 1),
        num_dec_embedding=num_dec_embedding,
        self_attn_heads=config_dict["self_attn_heads"],
        cross_attn_heads=cross_attn_heads,
        in_dim=config_dict["in_dim"],
        out_dim=hr_num_embeddings + 1,  # includes <end>
        hidden_dim=config_dict["hidden_dim"],
        hidden_activation=config_dict["hidden_activation"],
        use_remat=use_remat)


def assemble_sequences(lr_indices, hr_indices, train_base_model,
                       lr_num_embeddings, hr_num_embeddings):
    """Build (hr_input, lr_input, hr_target) from BMU token grids
    (``train_quantized_transformer.py:423-455``)."""
    n = hr_indices.shape[0]
    end = jnp.full((n, 1), hr_num_embeddings, hr_indices.dtype)
    hr_target = jnp.concatenate([hr_indices, end], axis=1)
    if train_base_model:
        hr_input = jnp.concatenate(
            [lr_indices, hr_indices + lr_num_embeddings], axis=1)
        lr_input = None
    else:
        start = jnp.full((n, 1), hr_num_embeddings, hr_indices.dtype)
        hr_input = jnp.concatenate([start, hr_indices], axis=1)
        lr_input = lr_indices
    return hr_input, lr_input, hr_target


def sample_windows(rng, hr_input, hr_target, window):
    """One random length-``window`` slice per sample; returns the sliced
    input/target and the absolute position indices
    (``train_quantized_transformer.py:459-484``), as per-sample dynamic
    slices instead of materializing every window."""
    n, seq_in = hr_input.shape
    num_windows = seq_in - window + 1
    starts = jax.random.randint(rng, (n,), 0, num_windows)

    def slice_row(row, start):
        return jax.lax.dynamic_slice(row, (start,), (window,))

    win_input = jax.vmap(slice_row)(hr_input, starts)
    win_target = jax.vmap(slice_row)(hr_target, starts)
    pos = starts[:, None] + jnp.arange(window)[None, :]
    return win_input, win_target, pos


def make_train_step(model, optimizer, lr_codebook, hr_codebook,
                    train_base_model, lr_num_embeddings, hr_num_embeddings,
                    sliding_window=None, bf16=False, pipeline_mesh=None,
                    num_microbatches=None, zero_shards=None, grad_accum=1,
                    accum_mesh=None, grad_clip=None):
    """``bf16``: mixed-precision training — the forward/backward compute
    runs in bfloat16 (MXU-native) while master weights, gradients, Adam
    moments, and the loss stay float32.  BMU tokenization always runs in
    float32 so token assignments match the full-precision pipeline
    bit-for-bit.  Opt-in (``--bf16``); no reference equivalent (the
    reference trains fp32-only, ``train_quantized_transformer.py:490-508``).

    ``pipeline_mesh``: a mesh with a ``pipe`` axis — the forward/backward
    runs the decoder stack through the GPipe schedule of
    ``qaig_tpu.parallel.pipeline`` (params carry ``decoder_layers`` in
    stacked form, sharded over ``pipe``).  Opt-in (``--num-pipeline-stages``).

    ``zero_shards``: ``(mesh, param_spec, moment_spec)`` — ZeRO-1: grads
    are constrained to ``moment_spec`` (XLA reduce-scatters instead of
    all-reducing), the Adam update runs on 1/data-axis of every moment,
    and the updated params are constrained back to ``param_spec`` (one
    all-gather).  Opt-in (``--zero-opt``).

    ``grad_accum``: accumulate gradients over this many equal sequential
    chunks of the batch (``lax.scan``), then apply ONE Adam update —
    activation memory scales with the chunk, updates match the full-batch
    step (equal-size chunks make mean-of-chunk-means == full mean).
    ``accum_mesh`` keeps each chunk's batch axis sharded over ``data``
    through the reshape.  Opt-in (``--grad-accum``).

    ``grad_clip``: clip the gradient's GLOBAL norm to this value before the
    Adam update.  Opt-in (``--grad-clip``) and beyond-reference: the
    reference's only stability mechanism is raising on NaN loss
    (``train_quantized_transformer.py:503-504``); clipping prevents the
    late-training CE spikes observed on the final cascade stage (QUALITY.md
    run notes) instead of merely detecting their aftermath.
    """
    def step(params, opt_state, cb_params, batch, rng):
        lr_params, hr_params = cb_params
        lr_idx = lr_codebook.get_patches_bmu(lr_params, batch, reshape=True)
        hr_idx = hr_codebook.get_patches_bmu(hr_params, batch, reshape=True)
        hr_input, lr_input, hr_target = assemble_sequences(
            lr_idx, hr_idx, train_base_model, lr_num_embeddings,
            hr_num_embeddings)

        pos_cond = None
        if sliding_window is not None:
            hr_input, hr_target, pos_cond = sample_windows(
                rng, hr_input, hr_target, sliding_window)

        def loss_fn(p, hr_in, lr_in, pos_c, hr_tgt):
            if bf16:
                p = common.cast_floats(p, jnp.bfloat16)
            if pipeline_mesh is not None:
                logits = pipeline.pipelined_apply(
                    model, p, hr_in, x_enc=lr_in, pos_cond=pos_c,
                    mesh=pipeline_mesh, num_microbatches=num_microbatches)
            else:
                logits = model.apply(p, hr_in, x_enc=lr_in, pos_cond=pos_c)
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32).reshape(-1, logits.shape[-1]),
                hr_tgt.reshape(-1))
            return jnp.mean(losses)

        if grad_accum <= 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                params, hr_input, lr_input, pos_cond, hr_target)
        else:
            a = grad_accum

            def chunk(x):
                x = x.reshape((a, x.shape[0] // a) + x.shape[1:])
                if accum_mesh is not None:
                    x = jax.lax.with_sharding_constraint(
                        x, jax.sharding.NamedSharding(
                            accum_mesh, jax.sharding.PartitionSpec(
                                None, "data")))
                return x

            xs = {"hr_in": chunk(hr_input), "hr_tgt": chunk(hr_target)}
            if lr_input is not None:
                xs["lr_in"] = chunk(lr_input)
            if pos_cond is not None:
                xs["pos"] = chunk(pos_cond)

            def body(acc, x):
                l, g = jax.value_and_grad(loss_fn)(
                    params, x["hr_in"], x.get("lr_in"), x.get("pos"),
                    x["hr_tgt"])
                acc_l, acc_g = acc
                return (acc_l + l, jax.tree_util.tree_map(
                    jnp.add, acc_g, g)), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                body, (jnp.zeros(()), zeros), xs)
            loss = loss_sum / a
            grads = jax.tree_util.tree_map(lambda g: g / a, grad_sum)
        if grad_clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        if zero_shards is not None:
            z_mesh, z_param_spec, z_moment_spec = zero_shards

            def pin(tree, spec_tree):
                return jax.tree_util.tree_map(
                    lambda x, s: jax.lax.with_sharding_constraint(
                        x, jax.sharding.NamedSharding(z_mesh, s)),
                    tree, spec_tree)

            grads = pin(grads, z_moment_spec)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if zero_shards is not None:
            params = pin(params, z_param_spec)
            opt_state = constrain_opt_state(optimizer, opt_state, z_mesh,
                                            z_moment_spec)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def checkpoint_dict(cfg, config_dict, train_base_model, sliding_window,
                    params, opt_state):
    return {
        "train_base_model": train_base_model,
        "use_sliding_window": cfg.use_pos_cond,
        "sliding_window": sliding_window,
        "num_enc_embedding": (cfg.num_enc_embedding if cfg.use_encoder
                              else None),
        "num_dec_embedding": cfg.num_dec_embedding,
        "num_enc_layers": cfg.num_enc_layers if cfg.use_encoder else None,
        "num_dec_layers": cfg.num_dec_layers,
        "self_attn_heads": cfg.self_attn_heads,
        "cross_attn_heads": (cfg.cross_attn_heads if cfg.use_encoder
                             else None),
        "transformer_in_dim": cfg.in_dim,
        "transformer_out_dim": cfg.out_dim,
        "transformer_hidden_dim": cfg.hidden_dim,
        "hidden_activation": cfg.hidden_activation,
        "model": None,  # filled by caller
        "model_optimizer": None,
    }


def generate_preview_tokens(engine, params, feature_map, lr_codebook,
                            lr_params, train_base_model, lr_num_embeddings,
                            hr_num_embeddings, total_hr_seq, temperature,
                            sliding_window, rng):
    """Checkpoint-time AR preview (``train_quantized_transformer.py:
    581-661``): returns HR-vocabulary token grid (N, total_hr_seq)."""
    lr_tokens = lr_codebook.get_patches_bmu(lr_params, feature_map,
                                            reshape=True)
    n = lr_tokens.shape[0]
    if train_base_model:
        init = lr_tokens
        x_enc = None
        shift = lr_num_embeddings
    else:
        init = jnp.full((n, 1), hr_num_embeddings, jnp.int32)
        x_enc = lr_tokens
        shift = 0

    settings = SamplerSettings(
        temperature=temperature, end_token=hr_num_embeddings,
        end_mode="replace_zero", index_shift=shift)
    tokens = engine.generate(params, init, total_hr_seq, rng, settings,
                             x_enc=x_enc, sliding_window=sliding_window)
    return tokens - shift


def validate_parallel_args(cfg, batch_size, args):
    """Validate the --num-model-shards / --num-pipeline-stages /
    --num-microbatches / --bf16 combination and return
    ``(n_model, n_pipe, num_microbatches)`` (``num_microbatches`` is None
    when pipelining is off)."""
    n_model = int(args.get("num_model_shards") or 1)
    n_pipe = int(args.get("num_pipeline_stages") or 1)
    raw_accum = args.get("grad_accum")
    grad_accum = 1 if raw_accum is None else int(raw_accum)
    if cfg.hidden_dim % n_model:
        raise ValueError(
            f"hidden_dim {cfg.hidden_dim} not divisible by "
            f"--num-model-shards {n_model}")
    if n_pipe < 1:
        raise ValueError(f"--num-pipeline-stages must be >= 1, got {n_pipe}")
    if grad_accum < 1:
        raise ValueError(f"--grad-accum must be >= 1, got {grad_accum}")
    if grad_accum > 1:
        if batch_size % grad_accum:
            raise ValueError(
                f"batch size {batch_size} not divisible by "
                f"--grad-accum {grad_accum}")
        if n_pipe > 1:
            raise ValueError(
                "--grad-accum cannot be combined with "
                "--num-pipeline-stages (the GPipe schedule already "
                "microbatches; use --num-microbatches instead)")
    num_microbatches = None
    if n_pipe > 1:
        if cfg.num_dec_layers % n_pipe:
            raise ValueError(
                f"num_dec_layers {cfg.num_dec_layers} not divisible by "
                f"--num-pipeline-stages {n_pipe}")
        raw_mb = args.get("num_microbatches")
        if raw_mb is not None and int(raw_mb) < 1:
            raise ValueError(
                f"--num-microbatches must be >= 1, got {raw_mb}")
        num_microbatches = int(raw_mb) if raw_mb is not None else n_pipe
        if batch_size % num_microbatches:
            raise ValueError(
                f"batch size {batch_size} not divisible by "
                f"--num-microbatches {num_microbatches}")
        if n_model > 1 and args.get("bf16") \
                and jax.default_backend() == "cpu":
            # PP x TP uses a partially-manual shard_map ('model' left to
            # GSPMD); XLA:CPU aborts the process promoting bf16
            # all-reduces under that layout (AllReducePromotion pass) — a
            # host-backend toolchain limitation, so the rejection is gated
            # on the backend: on TPU the combination is allowed (the TPU
            # compiler promotes bf16 collectives fine).  A ValueError
            # beats a SIGABRT on the backend that would abort.
            raise ValueError(
                "--bf16 cannot be combined with both "
                "--num-pipeline-stages and --num-model-shards on the CPU "
                "backend: bf16 all-reduces under the partially-manual "
                "PP x TP mesh hit an XLA:CPU AllReducePromotion abort. "
                "Use fp32 for PP x TP on CPU, bf16 with PP or TP alone, "
                "or run on TPU where the full combination is supported.")
        if args.get("zero_opt"):
            raise ValueError(
                "--zero-opt cannot be combined with "
                "--num-pipeline-stages (pipeline stages already shard "
                "the decoder moments over 'pipe'; ZeRO over 'data' on "
                "top is untested)")
    return n_model, n_pipe, num_microbatches


def run(args):
    common.select_platform(args.get("device"),
                           args.get("compiler_options"))
    common.maybe_init_distributed(args)
    common.apply_debug_flags(args)
    common.apply_compilation_cache(args)
    out_dir = common.ensure_dir(args["out_dir"])
    log = setup_logging(out_dir, PROJECT_NAME,
                        main_process=common.is_main_process())
    profiler = common.Profiler(args)
    metrics = common.MetricsLogger(out_dir,
                                   enabled=common.is_main_process())

    config_dict = common.load_config(args["config_path"])
    model_lr = config_dict["model_lr"]
    train_base_model = args.get("train_base_model", False)
    temperature = args.get("temperature", 1.0)
    test_num_sample = args.get("test_num_sample", 25)
    lr_update_step = args.get("lr_step", 50_000)
    checkpoint_step = args.get("checkpoint_step", 1_000)
    batch_size = args.get("batch_size", 8)
    max_epoch = args.get("max_epoch", 1_000)
    max_steps = args.get("max_steps")

    # Pre-trained decoder + codebooks.
    status, dec_ckpt = load_model(args["decoder_path"], logging=log.info)
    if not status:
        raise RuntimeError(
            "An error occured while loading decoder model checkpoint!")
    decoder, dec_params, _ = common.decoder_from_checkpoint(
        dec_ckpt, logging=log.info)
    decode_image = jax.jit(decoder.apply)

    status, lr_ckpt = load_model(args["lr_codebook_path"], logging=log.info)
    if not status:
        raise RuntimeError(
            "An error occured while loading Low-Resolution codebook "
            "checkpoint!")
    lr_codebook, lr_params = common.codebook_from_checkpoint(
        lr_ckpt, logging=log.info)

    status, hr_ckpt = load_model(args["hr_codebook_path"], logging=log.info)
    if not status:
        raise RuntimeError(
            "An error occured while loading High-Resolution codebook "
            "checkpoint!")
    hr_codebook, hr_params = common.codebook_from_checkpoint(
        hr_ckpt, logging=log.info)

    lr_num_embeddings = lr_codebook.num_embeddings
    hr_num_embeddings = hr_codebook.num_embeddings
    total_hr_seq = hr_codebook.seq_len

    use_sliding_window = config_dict["use_sliding_window"]
    sliding_window = (config_dict["sliding_window"] if use_sliding_window
                      else None)

    cfg = build_transformer_config(
        config_dict, train_base_model, lr_num_embeddings, hr_num_embeddings,
        use_remat=args.get("use_activation_checkpoint", False))
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(args.get("seed", 0)))

    optimizer = optim.make_adam(model_lr, lr_update_step)
    opt_state = optimizer.init(params)

    # --ema-decay: maintain an exponential-moving-average shadow of the
    # weights (saved as ``model_ema``; served via --use-ema).  Beyond the
    # reference (which checkpoints live weights only,
    # ``train_quantized_transformer.py:519-544``).
    ema_decay = args.get("ema_decay")
    ema_params = None
    if ema_decay is not None:
        ema_decay = float(ema_decay)
        if not 0.0 <= ema_decay < 1.0:
            raise ValueError(
                f"--ema-decay must be in [0, 1), got {ema_decay}")

    # --grad-clip: global-norm gradient clipping (beyond-reference
    # stability; see make_train_step).
    grad_clip = args.get("grad_clip")
    if grad_clip is not None:
        grad_clip = float(grad_clip)
        if not grad_clip > 0.0:
            raise ValueError(f"--grad-clip must be > 0, got {grad_clip}")

    # --auto-resume: continue from the newest checkpoint in out_dir
    # (model + optimizer + EMA + step counter).  Explicit --model-path wins.
    resume_steps = None
    if args.get("auto_resume") and not args.get("model_path"):
        latest, latest_n = common.find_latest_checkpoint(out_dir,
                                                         logging=log.info)
        if latest is None:
            log.info("Auto-resume: no checkpoint under "
                     f"{out_dir}/models_checkpoint; starting fresh.")
        else:
            args = dict(args, model_path=latest, load_optim=True)
            resume_steps = latest_n
            log.info(f"Auto-resume: continuing from {latest}")

    if args.get("model_path"):
        status, ckpt = load_model(args["model_path"], logging=log.info)
        if not status:
            raise RuntimeError(
                "An error occured while loading model checkpoint!")
        params = common.restore_model_state(model, params, ckpt["model"],
                                            logging=log.info)
        if args.get("auto_resume"):
            resume_steps = int(ckpt.get("global_steps", resume_steps or 0))
        if ema_decay is not None and ckpt.get("model_ema") is not None:
            ema_params = common.restore_model_state(
                model, jax.tree_util.tree_map(jnp.copy, params),
                ckpt["model_ema"], logging=log.info)
        if args.get("load_optim") and ckpt.get("model_optimizer") is not None:
            try:
                opt_state = common.restore_opt_state(
                    model, params, opt_state, ckpt["model_optimizer"],
                    logging=log.info)
            except Exception as e:
                log.info(f"Could not restore optimizer state: {e}")
    if ema_decay is not None and ema_params is None:
        ema_params = jax.tree_util.tree_map(jnp.copy, params)

    # DP over the mesh's data axis; Megatron-style TP of every 2-layer MLP
    # over the model axis (--num-model-shards).  With one model shard the
    # spec degenerates to replicated, so the same code path always runs.
    # --num-pipeline-stages instead partitions decoder LAYERS over a 'pipe'
    # axis (GPipe microbatching, qaig_tpu.parallel.pipeline).
    n_model, n_pipe, num_microbatches = validate_parallel_args(
        cfg, batch_size, args)
    grad_accum = int(args.get("grad_accum") or 1)
    if n_pipe > 1:
        mesh = make_mesh_for_batch(batch_size // num_microbatches,
                                   n_model=n_model, n_pipe=n_pipe)
        params = pipeline.stack_params(params)
        opt_state = pipeline.stack_params(opt_state)
        if ema_params is not None:
            ema_params = pipeline.stack_params(ema_params)
        param_spec = pipeline.pipeline_param_spec(params)
    else:
        # --grad-accum: the mesh only ever sees one chunk at a time
        mesh = make_mesh_for_batch(batch_size // grad_accum,
                                   n_model=n_model)
        param_spec = transformer_param_spec(params)
    # ZeRO-1 (--zero-opt): Adam moments additionally sharded over 'data'.
    moment_spec = None
    if args.get("zero_opt"):
        moment_spec = zero_opt_spec(params, param_spec, mesh.shape["data"])
    data_sharding = batch_sharding(mesh, ndim=4)
    params = shard_tree(mesh, params, param_spec)
    if ema_params is not None:
        ema_params = shard_tree(mesh, ema_params, param_spec)
    opt_state = shard_opt_state(mesh, optimizer, opt_state, param_spec,
                                moment_spec=moment_spec)
    lr_params = shard_tree(mesh, lr_params)
    hr_params = shard_tree(mesh, hr_params)

    dataset = FeatureMapDataset(args["dataset_path"])
    loader = DataLoader(dataset, batch_size=batch_size,
                        seed=args.get("seed", 0),
                        process_index=jax.process_index(),
                        process_count=jax.process_count())
    test_batch = min(test_num_sample, len(dataset))
    skip_preview = bool(args.get("skip_preview"))
    if jax.process_count() > 1:
        # previews run SPMD on the global mesh: the test batch must tile
        # both the data axis and the process count
        import math
        tile = math.lcm(mesh.shape["data"], jax.process_count())
        test_batch = (test_batch // tile) * tile
        if test_batch == 0 and not skip_preview:
            log.info(f"Skipping AR previews: dataset ({len(dataset)} "
                     f"samples) cannot tile the global mesh "
                     f"(needs a multiple of {tile}).")
            skip_preview = True
            test_batch = tile  # loader placeholder; never iterated
    test_loader = DataLoader(dataset, batch_size=test_batch,
                             seed=args.get("seed", 0) + 1,
                             process_index=jax.process_index(),
                             process_count=jax.process_count())

    train_step = make_train_step(
        model, optimizer, lr_codebook, hr_codebook, train_base_model,
        lr_num_embeddings, hr_num_embeddings, sliding_window,
        bf16=bool(args.get("bf16")),
        pipeline_mesh=mesh if n_pipe > 1 else None,
        num_microbatches=num_microbatches,
        zero_shards=((mesh, param_spec, moment_spec)
                     if moment_spec is not None else None),
        grad_accum=grad_accum,
        accum_mesh=mesh if grad_accum > 1 else None,
        grad_clip=grad_clip)
    engine = DecodeEngine(model)

    ema_step = None
    if ema_params is not None:
        def _ema_update(ema, p):
            return jax.tree_util.tree_map(
                lambda ev, pv: ev * ema_decay + pv * (1.0 - ema_decay),
                ema, p)
        ema_step = jax.jit(_ema_update, donate_argnums=(0,))

    def to_checkpoint_form(tree):
        """Pipeline training stores decoder layers stacked/'pipe'-sharded;
        checkpoints keep the reference's per-layer-list schema."""
        if n_pipe > 1:
            return pipeline.unstack_params(tree, cfg.num_dec_layers)
        return tree

    quant_hr = jax.jit(lambda p, x: hr_codebook.apply(
        p, x, neighbourhood_range=hr_codebook.neighbourhood_range))
    quant_lr = jax.jit(lambda p, x: lr_codebook.apply(
        p, x, neighbourhood_range=lr_codebook.neighbourhood_range))
    quant_image = jax.jit(
        lambda p, idx: hr_codebook.get_quantized_image(p, idx))

    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    log.info(PROJECT_NAME)
    log.info(f"Output Dir: {out_dir}")
    log.info(f"Model size: {n_params:,}")
    log.info("#" * 100)
    log.info("Codebook Parameters.")
    log.info(f"Low Res Patch size: {lr_codebook.patch_dim}")
    log.info(f"Low Res Num Embeddings: {lr_num_embeddings:,}")
    log.info(f"High Res Patch size: {hr_codebook.patch_dim}")
    log.info(f"High Res Num Embeddings: {hr_num_embeddings:,}")
    log.info("#" * 100)
    log.info("Transformer Parameters.")
    log.info("Mesh: data={} x model={}{}{}{}".format(
        mesh.shape["data"], mesh.shape["model"],
        f" x pipe={mesh.shape['pipe']} (microbatches={num_microbatches})"
        if n_pipe > 1 else "",
        " | ZeRO-1 optimizer sharding" if moment_spec is not None else "",
        f" | grad-accum {grad_accum}" if grad_accum > 1 else ""))
    if use_sliding_window:
        log.info(f"Sliding Window: {sliding_window:,}")
    log.info(f"Num Decoder Embedding: {cfg.num_dec_embedding:,}")
    log.info(f"Num Decoder Layers: {cfg.num_dec_layers:,}")
    log.info(f"Self Attention Heads: {cfg.self_attn_heads:,}")
    log.info(f"In Dim: {cfg.in_dim:,}")
    log.info(f"Out Dim: {cfg.out_dim:,}")
    log.info(f"Hidden Dim: {cfg.hidden_dim:,}")
    log.info(f"Hidden activation: {cfg.hidden_activation}")
    log.info("#" * 100)
    log.info("Training Parameters.")
    log.info(f"Max Epoch: {max_epoch:,}")
    log.info(f"Batch Size: {batch_size:,}")
    log.info(f"Model LR Update size: {lr_update_step:,}")
    log.info(f"Model Checkpoint step: {checkpoint_step:,}")
    if ema_decay is not None:
        log.info(f"EMA decay: {ema_decay}")
    if grad_clip is not None:
        log.info(f"Gradient clip (global norm): {grad_clip}")
    log.info("#" * 100)

    rng = jax.random.PRNGKey(args.get("seed", 0))
    log_every = args.get("log_every", 1)
    throughput = common.ThroughputMeter(batch_size)
    # A checkpoint saved at counter N already contains update N+1 (the
    # train step precedes the save in the loop); resume continues at N+1
    # so a preempted run applies exactly the updates an uninterrupted one
    # would — no boundary-step replay.
    global_steps = 0 if resume_steps is None else resume_steps + 1
    if resume_steps is not None:
        log.info(f"Resuming at global step {global_steps:,}.")
    stop = False
    for _ in range(max_epoch):
        total_loss = 0.0
        iteration_count = 0
        loss_acc = jnp.zeros(())
        for index, feature_map in enumerate(loader):
            profiler.step(global_steps)
            batch = common.put_global_batch(data_sharding, feature_map)
            rng, step_rng = jax.random.split(rng)
            params, opt_state, loss = train_step(
                params, opt_state, (lr_params, hr_params), batch, step_rng)
            if ema_step is not None:
                ema_params = ema_step(ema_params, params)
            iteration_count += 1
            loss_acc = loss_acc + loss
            should_sync = (log_every <= 1
                           or (global_steps + 1) % log_every == 0
                           or global_steps % checkpoint_step == 0)
            if should_sync:
                total_loss = float(loss_acc)
                common.check_finite(total_loss)

            if global_steps % checkpoint_step == 0:
                # every process joins the gathers (SPMD); only the main
                # process touches the filesystem
                ckpt = checkpoint_dict(cfg, config_dict, train_base_model,
                                       sliding_window, params, opt_state)
                ckpt["global_steps"] = global_steps
                params_ckpt_form = to_checkpoint_form(params)
                ckpt["model"] = common.model_state_dict(params_ckpt_form)
                ckpt["model_optimizer"] = common.gather_replicated(
                    to_checkpoint_form(opt_state))
                if ema_params is not None:
                    ckpt["model_ema"] = common.model_state_dict(
                        to_checkpoint_form(ema_params))
                if common.is_main_process():
                    save_status = save_model(
                        ckpt, dest_path=out_dir,
                        backend=args.get("checkpoint_backend", "pickle"),
                        file_name=f"model_{global_steps}.pt",
                        logging=log.info)
                    log.info("Successfully saved model." if save_status
                             else "Error occured saving model.")
                    if save_status and args.get("keep_checkpoints"):
                        common.prune_checkpoints(
                            out_dir, int(args["keep_checkpoints"]),
                            logging=log.info,
                            backend=args.get("checkpoint_backend"))

                if not skip_preview:
                    # Previews run on EVERY process (the computations are
                    # SPMD over the global mesh under multihost); only the
                    # main process touches the filesystem.
                    local = np.asarray(next(iter(test_loader)))
                    if jax.process_count() == 1:
                        test_fmap = jnp.asarray(local)
                    else:
                        test_fmap = common.put_global_batch(data_sharding,
                                                            local)

                    def dump(arr, name):
                        arr = common.gather_replicated(arr)
                        if common.is_main_process():
                            save_images(np.asarray(arr), name, out_dir,
                                        logging=log.info)

                    dump(decode_image(dec_params, test_fmap),
                         f"ground_truth_{global_steps}")
                    dump(decode_image(dec_params,
                                      quant_lr(lr_params, test_fmap)),
                         f"low_res_cond_{global_steps}")
                    dump(decode_image(dec_params,
                                      quant_hr(hr_params, test_fmap)),
                         f"high_res_example_{global_steps}")

                    rng, gen_rng = jax.random.split(rng)
                    preview_params = params
                    if n_pipe > 1:
                        # the decode engine runs per-layer-list params
                        # (replicated; PP is a training-scale feature)
                        preview_params = shard_tree(mesh, params_ckpt_form)
                    tokens = generate_preview_tokens(
                        engine, preview_params, test_fmap, lr_codebook,
                        lr_params,
                        train_base_model, lr_num_embeddings,
                        hr_num_embeddings, total_hr_seq, temperature,
                        sliding_window, gen_rng)
                    dump(decode_image(dec_params,
                                      quant_image(hr_params, tokens)),
                         f"high_res_recon_{global_steps}")

            lr_now = optim.current_lr(model_lr, lr_update_step,
                                      global_steps + 1)
            if should_sync:
                avg = total_loss / iteration_count
                log.info(
                    "Cum. Steps: {:,} | Steps: {:,} / {:,} | L.R.: {:.8f} | "
                    "Recon Loss: {:.5f}".format(
                        global_steps + 1, index + 1, len(loader), lr_now,
                        avg))
                metrics.log(step=global_steps + 1, lr=lr_now, ce_loss=avg,
                            samples_per_sec=throughput.rate(
                                global_steps + 1))
            global_steps += 1
            if max_steps and global_steps >= max_steps:
                stop = True
                break
        if stop:
            break
    profiler.close()
    metrics.close()
    if not wait_pending_saves(logging=log.info):  # join async write
        raise RuntimeError(
            "An error occured while saving model checkpoint!")
    return model, params
