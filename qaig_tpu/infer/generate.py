"""Cascade image generation pipeline.

Parity with reference ``generate_images.py:19-374``: for each stage
"0","1","2"... of the config, load its transformer + codebooks, generate the
token sequence with rollout best-of-``num_beam`` sampling, decode the final
tokens through the HR codebook + FC decoder, and save an image grid.  Stage
"0" is the base model conditioned on random LR indices; each later stage is
conditioned on the previous stage's full token sequence through its encoder.

TPU-native: rollouts run as one batched KV-cached (or windowed) decode — the
reference runs ``num_beam`` sequential full-window recomputes per token
(``generate_images.py:262-322``).
"""

import jax
import jax.numpy as jnp
import numpy as np

from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings
from qaig_tpu.models.transformer import Transformer, TransformerConfig
from qaig_tpu.parallel import batch_sharding, shard_tree
from qaig_tpu.parallel.mesh import make_mesh_for_batch
from qaig_tpu.parallel.sharding import transformer_param_spec
from qaig_tpu.train import common
from qaig_tpu.utils import load_model, save_images


def make_decode_mesh(num_images, n_model=1):
    """Mesh for sharded generation: the image batch is split over the
    data axis; with ``n_model > 1`` the transformer weights are
    additionally tensor-parallel over the model axis (serving models too
    large for one chip's HBM)."""
    return make_mesh_for_batch(num_images, n_model=n_model)


def shard_decode_inputs(mesh, params, init_tokens, x_enc=None):
    """Place the decode inputs on the mesh: the token batch shards over
    'data'; params replicate, or — when the mesh has a model axis — shard
    Megatron-style per ``transformer_param_spec`` (each 2-layer MLP is
    column- then row-sharded; one all-reduce per MLP, inserted by XLA).
    GSPMD propagates both shardings through the whole decode (KV caches,
    scan carries, sampling)."""
    if mesh.shape.get("model", 1) > 1:
        params = shard_tree(mesh, params, transformer_param_spec(params))
    else:
        params = shard_tree(mesh, params)
    spec = batch_sharding(mesh, ndim=2)
    init_tokens = jax.device_put(init_tokens, spec)
    if x_enc is not None:
        x_enc = jax.device_put(x_enc, spec)
    return params, init_tokens, x_enc


def transformer_from_checkpoint(ckpt, logging=print, use_ema=False):
    """Rebuild a Transformer purely from its (self-describing) checkpoint
    dict (``generate_images.py:171-204``).

    ``use_ema``: restore the exponential-moving-average weights
    (``model_ema``, written by training under ``--ema-decay``) instead of
    the live weights; falls back to ``model`` with a log line when the
    checkpoint carries no EMA."""
    train_base_model = ckpt["train_base_model"]
    cfg = TransformerConfig(
        use_encoder=not train_base_model,
        use_pos_cond=ckpt["use_sliding_window"],
        num_enc_layers=ckpt["num_enc_layers"] or 0,
        num_dec_layers=ckpt["num_dec_layers"],
        num_enc_embedding=ckpt["num_enc_embedding"] or 1,
        num_dec_embedding=ckpt["num_dec_embedding"],
        self_attn_heads=ckpt["self_attn_heads"],
        cross_attn_heads=ckpt["cross_attn_heads"] or 0,
        in_dim=ckpt["transformer_in_dim"],
        out_dim=ckpt["transformer_out_dim"],
        hidden_dim=ckpt["transformer_hidden_dim"],
        hidden_activation=ckpt["hidden_activation"])
    model = Transformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = ckpt["model"]
    if use_ema:
        if ckpt.get("model_ema") is not None:
            state = ckpt["model_ema"]
        else:
            logging("Checkpoint has no model_ema; using live weights.")
    params = common.restore_model_state(model, params, state,
                                        logging=logging)
    return model, params, ckpt


def generate_stage_tokens(model, params, stage_cfg, num_images, rng,
                          is_base_stage, lr_num_embeddings,
                          hr_num_embeddings, total_seq, sliding_window,
                          lr_input=None, init_tokens=None, mesh=None):
    """Run one cascade stage; returns HR-vocabulary tokens (N, total_seq).

    With ``mesh``, the batch is sharded over the mesh's data axis (params
    replicated) so generation scales across chips."""
    engine = DecodeEngine(model)
    if mesh is not None:
        params, init_tokens, lr_input = shard_decode_inputs(
            mesh, params, init_tokens, lr_input)

    if is_base_stage:
        shift = lr_num_embeddings
        x_enc = None
    else:
        shift = 0
        x_enc = lr_input

    settings = SamplerSettings(
        temperature=stage_cfg["temperature"],
        end_token=hr_num_embeddings,
        end_mode="mask",
        index_shift=shift,
        pos_offset=1)  # generate_images.py:315-319 position quirk

    tokens = engine.rollout_generate(
        params, init_tokens, total_seq, rng, settings,
        num_beam=stage_cfg["num_beam"], beam_width=stage_cfg["beam_width"],
        x_enc=x_enc, sliding_window=sliding_window)
    return tokens - shift


def _load_stage(index, stage_cfg, cast, use_ema=False):
    """Load one cascade stage's codebooks + transformer from disk into a
    dict of everything both generation paths need."""
    lr_codebook = None
    lr_params = None
    lr_num_embeddings = 0
    if stage_cfg.get("lr_codebook_path") is not None:
        status, lr_ckpt = load_model(stage_cfg["lr_codebook_path"])
        if not status:
            raise RuntimeError(
                "An error occured while loading codebook checkpoint!")
        lr_codebook, lr_params = common.codebook_from_checkpoint(lr_ckpt)
        lr_params = cast(lr_params)
        lr_num_embeddings = lr_codebook.num_embeddings

    status, hr_ckpt = load_model(stage_cfg["hr_codebook_path"])
    if not status:
        raise RuntimeError(
            "An error occured while loading codebook checkpoint!")
    hr_codebook, hr_params = common.codebook_from_checkpoint(hr_ckpt)
    hr_params = cast(hr_params)
    total_seq = hr_codebook.seq_len

    if total_seq % stage_cfg["beam_width"] != 0:
        raise ValueError("Invalid value for beam_width!")

    status, model_ckpt = load_model(stage_cfg["model_path"])
    if not status:
        raise RuntimeError(
            "An error occured while loading model checkpoint!")
    model, params, model_ckpt = transformer_from_checkpoint(
        model_ckpt, use_ema=use_ema)
    return {
        "index": index, "stage_cfg": stage_cfg, "model": model,
        "params": cast(params), "lr_codebook": lr_codebook,
        "lr_params": lr_params, "lr_num_embeddings": lr_num_embeddings,
        "hr_codebook": hr_codebook, "hr_params": hr_params,
        "hr_num_embeddings": hr_codebook.num_embeddings,
        "total_seq": total_seq,
        "sliding_window": (model_ckpt["sliding_window"]
                           if model_ckpt["use_sliding_window"] else None),
        "is_base": index == "0"}


def _run_fused(stages, decoder, dec_params, num_images, rng):
    """The whole cascade — every stage's rollout, the stage-0 conditioning
    recon, and every stage's pixel decode — as ONE jitted program: a solo
    interactive request costs one device dispatch instead of hundreds of
    sequential per-segment programs (measured 0.18 s vs 0.42 s solo on
    v5e, scripts/probe_latency.py).  Token-identical to the dispatched
    loop: same RNG split order, same per-segment programs traced inline
    (tests/test_generation_parity.py)."""
    def cascade(stage_params, lr0_params, hr_params_list, dparams, key):
        cond = None
        prev_tokens = None
        recons = []
        for st, params, hrp in zip(stages, stage_params, hr_params_list):
            settings = SamplerSettings(
                temperature=st["stage_cfg"]["temperature"],
                end_token=st["hr_num_embeddings"],
                end_mode="mask",
                index_shift=(st["lr_num_embeddings"] if st["is_base"]
                             else 0),
                pos_offset=1)
            if st["is_base"]:
                key, init_rng = jax.random.split(key)
                init_tokens = jax.random.randint(
                    init_rng, (num_images, st["lr_codebook"].seq_len), 0,
                    st["lr_num_embeddings"])
                x_enc = None
                lr_quant = st["lr_codebook"].get_quantized_image(
                    lr0_params, init_tokens)
                cond = decoder.apply(dparams, lr_quant).astype(jnp.float32)
            else:
                x_enc = prev_tokens
                init_tokens = jnp.full(
                    (num_images, 1), st["hr_num_embeddings"], jnp.int32)
            key, gen_rng = jax.random.split(key)
            engine = DecodeEngine(st["model"])
            tokens = engine.rollout_generate(
                params, init_tokens, st["total_seq"], gen_rng, settings,
                num_beam=st["stage_cfg"]["num_beam"],
                beam_width=st["stage_cfg"]["beam_width"],
                x_enc=x_enc, sliding_window=st["sliding_window"])
            tokens = tokens - settings.index_shift
            hr_quant = st["hr_codebook"].get_quantized_image(hrp, tokens)
            recons.append(decoder.apply(dparams, hr_quant)
                          .astype(jnp.float32))
            prev_tokens = tokens
        return cond, recons, prev_tokens

    fn = jax.jit(cascade)
    return fn([st["params"] for st in stages], stages[0]["lr_params"],
              [st["hr_params"] for st in stages], dec_params, rng)


def run(args):
    common.select_platform(args.get("device"),
                           args.get("compiler_options"))
    common.apply_compilation_cache(args)
    common.maybe_init_distributed(args)
    out_dir = common.ensure_dir(args["out_dir"])
    num_images = args.get("num_images", 25)
    rng = jax.random.PRNGKey(args.get("seed") or 0)
    profiler = common.Profiler(args)
    # Sharded generation: every chip decodes its slice of the batch; with
    # --num-model-shards > 1 the transformer weights are tensor-parallel
    # over the model axis as well.
    mesh = make_decode_mesh(num_images,
                            n_model=args.get("num_model_shards") or 1)
    print(f"Generation mesh: data={mesh.shape['data']} "
          f"x model={mesh.shape['model']}")

    config_dict = common.load_config(args["config_path"])

    status, dec_ckpt = load_model(args["decoder_path"])
    if not status:
        raise RuntimeError(
            "An error occured while loading decoder model checkpoint!")
    decoder, dec_params, _ = common.decoder_from_checkpoint(dec_ckpt)
    # --bf16: serving precision — bfloat16 compute halves the decode's HBM
    # streams; fp32 (reference numerics) stays the default.
    cast = ((lambda t: common.cast_floats(t, jnp.bfloat16))
            if args.get("bf16") else (lambda t: t))
    dec_params = cast(dec_params)
    decode_image = jax.jit(
        lambda p, q: decoder.apply(p, q).astype(jnp.float32))

    # Fused single-dispatch cascade (the interactive-latency path): default
    # whenever generation is unsharded; --no-fused forces the per-segment
    # dispatched loop, --fused asserts the fused path is applicable.
    fused = args.get("fused")
    unsharded = (mesh.shape["data"] == 1 and mesh.shape["model"] == 1
                 and jax.process_count() == 1)
    if fused is None:
        fused = unsharded
    elif fused and not unsharded:
        raise ValueError(
            "--fused requires unsharded generation (one device's mesh, "
            "single process); drop --num-model-shards or use --no-fused.")
    if fused:
        stages = [_load_stage(index, stage_cfg, cast,
                              use_ema=bool(args.get("use_ema")))
                  for index, stage_cfg in config_dict.items()]
        print(f"Fused single-dispatch cascade: {len(stages)} stages")
        if profiler.dir:
            jax.profiler.start_trace(str(profiler.dir))
            profiler.active = True
        cond, recons, tokens = _run_fused(
            stages, decoder, dec_params, num_images, rng)
        if stages[0]["is_base"] and common.is_main_process():
            save_images(np.asarray(cond), "recon_model_Cond", out_dir,
                        logging=print)
        for st, recon in zip(stages, recons):
            print(f"Model: {int(st['index']):,}")
            if common.is_main_process():
                save_images(np.asarray(recon),
                            f"recon_model_{st['index']}", out_dir,
                            logging=print)
        profiler.close()
        return tokens

    prev_tokens = None
    if profiler.dir:
        jax.profiler.start_trace(str(profiler.dir))
        profiler.active = True
    for index, stage_cfg in config_dict.items():
        print(f"Model: {int(index):,}")

        st = _load_stage(index, stage_cfg, cast,
                         use_ema=bool(args.get("use_ema")))
        model, params = st["model"], st["params"]
        lr_codebook, lr_params = st["lr_codebook"], st["lr_params"]
        lr_num_embeddings = st["lr_num_embeddings"]
        hr_codebook, hr_params = st["hr_codebook"], st["hr_params"]
        hr_num_embeddings = st["hr_num_embeddings"]
        total_seq, sliding_window = st["total_seq"], st["sliding_window"]

        is_base_stage = index == "0"
        if is_base_stage:
            # Random LR conditioning grid (reference uses (N, 1) because its
            # published stage-0 codebook is single-patch,
            # ``generate_images.py:217-221``; generalized to the codebook's
            # full token grid).
            rng, init_rng = jax.random.split(rng)
            init_tokens = jax.random.randint(
                init_rng, (num_images, lr_codebook.seq_len), 0,
                lr_num_embeddings)
            lr_input = None
            # save the conditioning reconstruction, like the reference
            lr_quant = lr_codebook.get_quantized_image(lr_params, init_tokens)
            cond = common.gather_replicated(decode_image(dec_params,
                                                         lr_quant))
            if common.is_main_process():
                save_images(np.asarray(cond), "recon_model_Cond", out_dir,
                            logging=print)
        else:
            lr_input = prev_tokens
            init_tokens = jnp.full((num_images, 1), hr_num_embeddings,
                                   jnp.int32)

        rng, gen_rng = jax.random.split(rng)
        tokens = generate_stage_tokens(
            model, params, stage_cfg, num_images, gen_rng, is_base_stage,
            lr_num_embeddings, hr_num_embeddings, total_seq, sliding_window,
            lr_input=lr_input, init_tokens=init_tokens, mesh=mesh)

        hr_quant = hr_codebook.get_quantized_image(hr_params, tokens)
        # gather before host transfer: under multihost the batch is sharded
        # across non-addressable devices; only process 0 writes
        recon = common.gather_replicated(decode_image(dec_params, hr_quant))
        if common.is_main_process():
            save_images(np.asarray(recon), f"recon_model_{index}", out_dir,
                        logging=print)

        prev_tokens = tokens
    profiler.close()
    return prev_tokens
