"""Library-level cascade pipeline: load once, generate many.

Programmatic (serving-friendly) counterpart of the ``generate_images`` CLI
(reference ``generate_images.py`` is batch-CLI only): all stage transformers,
codebooks and the pixel decoder are loaded and jitted once; ``generate``
then produces image batches with no host round-trips between stages.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings
from qaig_tpu.infer.generate import transformer_from_checkpoint
from qaig_tpu.train import common
from qaig_tpu.utils import load_model

# Fold tag separating the stage-0 random-conditioning-grid draw from the
# per-stage/per-beam/per-slot sampling folds (all small ints).
_INIT_TAG = 424242


def derive_row_keys(seed, num_rows, start=0):
    """Per-row sampling keys for ``pipeline.generate``'s row-keyed mode:
    row ``j`` gets ``fold_in(PRNGKey(seed), start + j)``.  The serving
    batcher builds a merged batch's keys per REQUEST with this (each
    request's own seed, rows numbered from 0), which makes a request's
    tokens independent of its co-batch."""
    base = jax.random.PRNGKey(seed)
    return jax.vmap(lambda j: jax.random.fold_in(base, j))(
        jnp.arange(start, start + num_rows))


@dataclass
class CascadeStage:
    model: object
    params: dict
    engine: DecodeEngine
    lr_codebook: object
    lr_params: dict
    hr_codebook: object
    hr_params: dict
    settings: SamplerSettings
    num_beam: int
    beam_width: int
    sliding_window: int
    total_seq: int
    is_base: bool

    @property
    def lr_num_embeddings(self):
        return self.lr_codebook.num_embeddings if self.lr_codebook else 0


class CascadePipeline:
    """The full coarse-to-fine generation stack.

    ``mesh``: optional ``('data', 'model')`` mesh — every generated batch
    is sharded over the data axis, so serving throughput scales with
    chips.  When the mesh has a model axis (>1), each stage transformer's
    weights are additionally tensor-parallel Megatron-style
    (``parallel.sharding.transformer_param_spec``) — serving models too
    large for one chip's HBM; codebooks/decoder stay replicated (tiny).
    """

    def __init__(self, stages, decoder, dec_params, mesh=None):
        self.stages = stages
        self.decoder = decoder
        self.dec_params = dec_params
        self.mesh = mesh
        # (num_images, temperature) -> jitted whole-cascade program; see
        # generate().  Keeps batch-1 latency at ONE device dispatch instead
        # of hundreds of per-segment dispatches (each paying a host->device
        # round-trip — the dominant cost of small interactive requests,
        # especially through a remote-backend relay).
        self._fused_cache = {}
        if mesh is not None:
            from qaig_tpu.parallel import shard_tree
            from qaig_tpu.parallel.sharding import transformer_param_spec
            tp = mesh.shape.get("model", 1) > 1
            self.dec_params = shard_tree(mesh, dec_params)
            for stage in self.stages:
                stage.params = shard_tree(
                    mesh, stage.params,
                    transformer_param_spec(stage.params) if tp else None)
                stage.hr_params = shard_tree(mesh, stage.hr_params)
                if stage.lr_params is not None:
                    stage.lr_params = shard_tree(mesh, stage.lr_params)
        self._decode_jit = jax.jit(decoder.apply)

    def _shard_batch(self, x):
        if self.mesh is None or x is None:
            return x
        from qaig_tpu.parallel import batch_sharding
        return jax.device_put(x, batch_sharding(self.mesh, ndim=x.ndim))

    @classmethod
    def from_config(cls, config_dict, decoder_path, logging=print,
                    mesh=None, dtype=None, use_ema=False):
        """``config_dict`` is the generate_images staged config (keys
        "0","1",... with model/codebook paths + sampling settings).

        ``dtype``: optional compute dtype for every float parameter
        (``jnp.bfloat16`` halves the decode's HBM streams and runs the
        matmuls at the MXU's native precision — the serving configuration;
        token sequences may differ from fp32 within sampling tolerance).
        Integer token plumbing is unaffected.

        ``use_ema``: serve the EMA weights (``model_ema``, written under
        ``--ema-decay``) instead of the live weights."""
        status, dec_ckpt = load_model(decoder_path, logging=logging)
        if not status:
            raise RuntimeError(
                "An error occured while loading decoder model checkpoint!")
        decoder, dec_params, _ = common.decoder_from_checkpoint(
            dec_ckpt, logging=logging)
        cast = ((lambda t: common.cast_floats(t, dtype))
                if dtype is not None else (lambda t: t))
        dec_params = cast(dec_params)

        stages = []
        for index in sorted(config_dict.keys(), key=int):
            stage_cfg = config_dict[index]
            lr_codebook = lr_params = None
            if stage_cfg.get("lr_codebook_path") is not None:
                ok, lr_ckpt = load_model(stage_cfg["lr_codebook_path"],
                                         logging=logging)
                if not ok:
                    raise RuntimeError(
                        "An error occured while loading codebook checkpoint!")
                lr_codebook, lr_params = common.codebook_from_checkpoint(
                    lr_ckpt, logging=logging)

            ok, hr_ckpt = load_model(stage_cfg["hr_codebook_path"],
                                     logging=logging)
            if not ok:
                raise RuntimeError(
                    "An error occured while loading codebook checkpoint!")
            hr_codebook, hr_params = common.codebook_from_checkpoint(
                hr_ckpt, logging=logging)

            ok, model_ckpt = load_model(stage_cfg["model_path"],
                                        logging=logging)
            if not ok:
                raise RuntimeError(
                    "An error occured while loading model checkpoint!")
            model, params, model_ckpt = transformer_from_checkpoint(
                model_ckpt, logging=logging, use_ema=use_ema)
            params = cast(params)
            hr_params = cast(hr_params)
            if lr_params is not None:
                lr_params = cast(lr_params)

            total_seq = hr_codebook.seq_len
            if total_seq % stage_cfg["beam_width"] != 0:
                raise ValueError("Invalid value for beam_width!")

            is_base = index == "0"
            settings = SamplerSettings(
                temperature=stage_cfg["temperature"],
                end_token=hr_codebook.num_embeddings,
                end_mode="mask",
                index_shift=(lr_codebook.num_embeddings if is_base else 0),
                pos_offset=1)  # generate_images.py:315-319 position quirk
            stages.append(CascadeStage(
                model=model, params=params, engine=DecodeEngine(model),
                lr_codebook=lr_codebook, lr_params=lr_params,
                hr_codebook=hr_codebook, hr_params=hr_params,
                settings=settings, num_beam=stage_cfg["num_beam"],
                beam_width=stage_cfg["beam_width"],
                sliding_window=(model_ckpt["sliding_window"]
                                if model_ckpt["use_sliding_window"]
                                else None),
                total_seq=total_seq, is_base=is_base))
        return cls(stages, decoder, dec_params, mesh=mesh)

    def generate_tokens(self, num_images, rng=None, init_tokens=None,
                        temperature=None, row_keys=None):
        """Run every stage; returns (final HR tokens, per-stage tokens).

        ``init_tokens`` optionally conditions stage 0 (defaults to random
        coarse indices like the reference).  ``temperature`` overrides
        every stage's configured sampling temperature for this call (each
        distinct value compiles its own decode programs once, then they
        cache).

        Sampling keys: pass EITHER ``rng`` (one key; batch-keyed sampling,
        split per stage — historical semantics) OR ``row_keys`` (N, 2),
        one PRNG key per image row.  With row keys, stage ``i`` of row
        ``n`` samples from ``fold_in(row_keys[n], i)`` (and the stage-0
        random conditioning grid from a further ``_INIT_TAG`` fold), so a
        row's entire trajectory is a pure function of its own key — the
        composition-invariant serving mode (`serve.py`).
        """
        import dataclasses
        if (rng is None) == (row_keys is None):
            raise ValueError("pass exactly one of rng / row_keys")
        per_stage = []
        tokens = init_tokens
        for stage_idx, stage in enumerate(self.stages):
            settings = stage.settings
            if temperature is not None:
                settings = dataclasses.replace(
                    settings, temperature=float(temperature))
            if row_keys is not None:
                gen_rng = jax.vmap(
                    lambda k: jax.random.fold_in(k, stage_idx))(row_keys)
            else:
                rng, gen_rng = jax.random.split(rng)
            if stage.is_base:
                if tokens is None:
                    if row_keys is not None:
                        init_keys = jax.vmap(lambda k: jax.random.fold_in(
                            k, _INIT_TAG))(gen_rng)
                        tokens = jax.vmap(lambda k: jax.random.randint(
                            k, (1,), 0, stage.lr_num_embeddings))(init_keys)
                    else:
                        rng, init_rng = jax.random.split(rng)
                        tokens = jax.random.randint(
                            init_rng, (num_images, 1), 0,
                            stage.lr_num_embeddings)
                init = self._shard_batch(tokens)
                x_enc = None
            else:
                init = self._shard_batch(
                    jnp.full((num_images, 1),
                             stage.hr_codebook.num_embeddings, jnp.int32))
                x_enc = self._shard_batch(tokens)
            out = stage.engine.rollout_generate(
                stage.params, init, stage.total_seq,
                self._shard_batch(gen_rng) if row_keys is not None
                else gen_rng, settings,
                num_beam=stage.num_beam, beam_width=stage.beam_width,
                x_enc=x_enc, sliding_window=stage.sliding_window)
            tokens = out - settings.index_shift
            per_stage.append(tokens)
        return tokens, per_stage

    def _fused_program(self, num_images, temperature):
        """One jitted program for the WHOLE cascade (all stages + codebook
        lookup + pixel decode) at a fixed (batch, temperature): a solo
        request costs one device dispatch instead of hundreds of sequential
        per-segment programs, each paying a host->device round-trip.  Same
        math as generate_tokens' dispatched loop (the per-segment programs
        are traced inline), row-keyed mode only."""
        key = (num_images, temperature)
        fn = self._fused_cache.get(key)
        if fn is not None:
            return fn
        import dataclasses
        last = self.stages[-1]

        def run(stage_params, hr_params, dec_params, row_keys):
            tokens = None
            for stage_idx, (stage, sp) in enumerate(
                    zip(self.stages, stage_params)):
                settings = stage.settings
                if temperature is not None:
                    settings = dataclasses.replace(
                        settings, temperature=float(temperature))
                gen_rng = jax.vmap(
                    lambda k: jax.random.fold_in(k, stage_idx))(row_keys)
                if stage.is_base:
                    init_keys = jax.vmap(lambda k: jax.random.fold_in(
                        k, _INIT_TAG))(gen_rng)
                    init = jax.vmap(lambda k: jax.random.randint(
                        k, (1,), 0, stage.lr_num_embeddings))(init_keys)
                    x_enc = None
                else:
                    init = jnp.full((num_images, 1),
                                    stage.hr_codebook.num_embeddings,
                                    jnp.int32)
                    x_enc = tokens
                out = stage.engine.rollout_generate(
                    sp, init, stage.total_seq, gen_rng, settings,
                    num_beam=stage.num_beam, beam_width=stage.beam_width,
                    x_enc=x_enc, sliding_window=stage.sliding_window)
                tokens = out - settings.index_shift
            quant = last.hr_codebook.get_quantized_image(hr_params, tokens)
            images = self.decoder.apply(dec_params, quant)
            return images.astype(jnp.float32), tokens

        fn = jax.jit(run)
        self._fused_cache[key] = fn
        return fn

    def generate(self, num_images, seed=0, init_tokens=None,
                 temperature=None, row_keys=None, fused=None):
        """Returns (images (N, C, H, W) in [-1, 1] BGR, final tokens).

        Sampling is ROW-KEYED: row ``j`` draws from
        ``fold_in(PRNGKey(seed), j)`` (or ``row_keys[j]`` when given
        explicitly — the serving batcher passes per-request keys so a
        request's tokens are identical solo and coalesced).  A row's
        result is therefore independent of the batch it runs in.

        ``fused``: run the whole cascade as ONE jitted program (default
        when unsharded and unconditioned) — one device dispatch per call
        instead of hundreds, the batch-1 interactive-latency path.  Pass
        ``False`` to force the per-segment dispatched loop."""
        if row_keys is None:
            row_keys = derive_row_keys(seed, num_images)
        if fused is None:
            fused = self.mesh is None and init_tokens is None
        if fused:
            if self.mesh is not None or init_tokens is not None:
                raise ValueError("fused generation supports only the "
                                 "unsharded, unconditioned path")
            fn = self._fused_program(num_images, temperature)
            return fn([s.params for s in self.stages],
                      self.stages[-1].hr_params, self.dec_params,
                      jnp.asarray(row_keys))
        tokens, _ = self.generate_tokens(num_images, row_keys=row_keys,
                                         init_tokens=init_tokens,
                                         temperature=temperature)
        last = self.stages[-1]
        quant = last.hr_codebook.get_quantized_image(last.hr_params, tokens)
        images = self._decode_jit(self.dec_params, quant)
        # host-friendly output regardless of the compute dtype
        return images.astype(jnp.float32), tokens
