"""Here -> reference (PyTorch) checkpoint export.

The exact inverse of :mod:`qaig_tpu.utils.torch_compat`: converts this
framework's param trees into reference-named, reference-layout torch
``state_dict``s so the reference's loaders (``torch.load`` +
``custom_load_state_dict``, ``/root/reference/utils/model_utils.py:36-52``,
``models/Autoencoder.py:45-61``) consume them with zero skipped keys.

Layout conversions (ours -> torch):

* dense kernel ``(in, out)`` -> Linear ``(out, in)``,
* conv ``HWIO`` -> Conv2d ``OIHW``,
* transposed-conv (stored correlation-ready = spatially flipped ``HWIO``,
  see ``qaig_tpu.models.core.conv_transpose2d``) -> ConvTranspose2d
  ``(in, out, kH, kW)`` unflipped,
* LayerNorm ``g``/``b`` -> ``weight``/``bias``; Embedding ``w`` -> ``weight``.

The name/layout correspondence is built ONCE as a mapping table
(:func:`mapping_for_model`) shared by the weight exporter and the torch-Adam
optimizer-state converters (``qaig_tpu.utils.torch_optim``) — the moment
tensors need the same per-parameter layout transform as the weights.
"""

import numpy as np


# ---------------------------------------------------------------------------
# per-leaf layout transforms (ours -> torch); inverses live in torch_compat
# ---------------------------------------------------------------------------

def to_torch_layout(value, kind):
    v = np.asarray(value, dtype=np.float32)
    if kind == "linear":
        return np.ascontiguousarray(v.T)
    if kind == "conv":
        return np.ascontiguousarray(v.transpose(3, 2, 0, 1))
    if kind == "convT":
        return np.ascontiguousarray(v.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])
    return np.ascontiguousarray(v)


def from_torch_layout(value, kind):
    """torch -> ours; mirrors the converters in ``torch_compat``."""
    v = np.asarray(value, dtype=np.float32)
    if kind == "linear":
        return np.ascontiguousarray(v.T)
    if kind == "conv":
        return np.ascontiguousarray(v.transpose(2, 3, 1, 0))
    if kind == "convT":
        return np.ascontiguousarray(v[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
    return np.ascontiguousarray(v)


# ---------------------------------------------------------------------------
# mapping tables: [(our_flat_path, torch_name, kind)] in torch
# registration order (= ``model.parameters()`` order, which torch Adam's
# ``param_groups`` indices follow)
# ---------------------------------------------------------------------------

def _linear_map(out, ours, theirs):
    out.append((f"{ours}.w", f"{theirs}.weight", "linear"))
    out.append((f"{ours}.b", f"{theirs}.bias", "plain"))


def _conv_map(out, ours, theirs, kind="conv"):
    out.append((f"{ours}.w", f"{theirs}.weight", kind))
    out.append((f"{ours}.b", f"{theirs}.bias", "plain"))


def _mlp2_map(out, ours, theirs):
    _linear_map(out, f"{ours}.l0", f"{theirs}.0.linear_layer.0")
    _linear_map(out, f"{ours}.l1", f"{theirs}.1.linear_layer.0")


def _norm_map(out, ours, theirs, use_adaln):
    if use_adaln:
        _linear_map(out, f"{ours}.scale", f"{theirs}.scale_layer.scale")
        _linear_map(out, f"{ours}.shift", f"{theirs}.shift_layer.shift")
    else:
        out.append((f"{ours}.g", f"{theirs}.weight", "plain"))
        out.append((f"{ours}.b", f"{theirs}.bias", "plain"))


def _res_map(out, ours, theirs, use_scale):
    if use_scale:
        # reference ResidualLinearLayer registers scale_layer before linear
        # (``models/layers.py:258-304``)
        _linear_map(out, f"{ours}.scale", f"{theirs}.scale_layer.scale")
    _linear_map(out, f"{ours}.linear", f"{theirs}.linear.linear_layer.0")


def _attn_map(out, ours, theirs):
    for o, t in (("q", "q_block"), ("k", "k_block"), ("v", "v_block")):
        _mlp2_map(out, f"{ours}.{o}", f"{theirs}.{t}")


def _block_map(out, ours, theirs, use_cross, use_adaln, use_scale):
    _norm_map(out, f"{ours}.self_attn.norm",
              f"{theirs}.self_attn_block.self_attn_norm", use_adaln)
    _attn_map(out, f"{ours}.self_attn.attn",
              f"{theirs}.self_attn_block.self_attn")
    _res_map(out, f"{ours}.self_attn.res",
             f"{theirs}.self_attn_block.self_attn_res", use_scale)
    if use_cross:
        _norm_map(out, f"{ours}.cross_attn.norm",
                  f"{theirs}.cross_attn_block.cross_attn_norm", use_adaln)
        _attn_map(out, f"{ours}.cross_attn.attn",
                  f"{theirs}.cross_attn_block.cross_attn")
        _res_map(out, f"{ours}.cross_attn.res",
                 f"{theirs}.cross_attn_block.cross_attn_res", use_scale)
    _norm_map(out, f"{ours}.ffn.norm",
              f"{theirs}.feedforward_block.feedforward_norm", use_adaln)
    _mlp2_map(out, f"{ours}.ffn.ff", f"{theirs}.feedforward_block.feedforward")
    _res_map(out, f"{ours}.ffn.res",
             f"{theirs}.feedforward_block.feedforward_res", use_scale)


def fc_encoder_mapping(num_layers, ours="", theirs=""):
    out = []
    for i in range(num_layers):
        _conv_map(out, f"{ours}layers.{i}",
                  f"{theirs}fc_encoder_layer.{i}.conv_layer.0")
    return out


def fc_decoder_mapping(specs, ours="", theirs=""):
    out = []
    for j, (_, _, kind) in enumerate(specs):
        if j == 0:
            tname = f"{theirs}fc_decoder_layer.0.0.conv_layer.0"
        elif j == 1:
            tname = f"{theirs}fc_decoder_layer.0.1.conv_layer.0"
        else:
            tname = f"{theirs}fc_decoder_layer.{j - 1}.conv_layer.0"
        _conv_map(out, f"{ours}layers.{j}", tname,
                  kind="convT" if kind == "up" else "conv")
    return out


def autoencoder_mapping(enc_specs, dec_specs):
    return (fc_encoder_mapping(len(enc_specs), "fc_encoder.", "fc_encoder.")
            + fc_decoder_mapping(dec_specs, "fc_decoder.", "fc_decoder."))


def codebook_mapping():
    return [("codebook", "codebook.weight", "plain")]


def transformer_mapping(cfg):
    """``cfg``: a :class:`qaig_tpu.models.transformer.TransformerConfig`.
    Order matches the reference ``Transformer.__init__`` registration
    (``models/Transformer.py:40-102``)."""
    out = []
    if cfg.use_encoder:
        out.append(("enc_embedding.w", "enc_embedding.weight", "plain"))
        for i in range(cfg.num_enc_layers):
            _block_map(out, f"encoder_layers.{i}", f"encoder_layers.{i}",
                       use_cross=False, use_adaln=False, use_scale=False)
    out.append(("dec_embedding.w", "dec_embedding.weight", "plain"))
    for i in range(cfg.num_dec_layers):
        _block_map(out, f"decoder_layers.{i}", f"decoder_layers.{i}",
                   use_cross=cfg.use_encoder, use_adaln=cfg.use_pos_cond,
                   use_scale=cfg.use_pos_cond)
    if cfg.use_pos_cond:
        _mlp2_map(out, "pos_cond_layer", "pos_cond_layer")
    _mlp2_map(out, "classifier", "classifier")
    return out


def mapping_for_model(model):
    """Mapping table for a model object (FCEncoder / FCDecoder /
    Autoencoder / Codebook / Transformer)."""
    from qaig_tpu.models.conv_nets import FCEncoder, FCDecoder, Autoencoder
    from qaig_tpu.models.codebook import Codebook
    from qaig_tpu.models.transformer import Transformer

    if isinstance(model, Autoencoder):
        return autoencoder_mapping(model.encoder.specs, model.decoder.specs)
    if isinstance(model, FCEncoder):
        return fc_encoder_mapping(len(model.specs))
    if isinstance(model, FCDecoder):
        return fc_decoder_mapping(model.specs)
    if isinstance(model, Codebook):
        return codebook_mapping()
    if isinstance(model, Transformer):
        return transformer_mapping(model.cfg)
    raise TypeError(f"Unsupported model type: {type(model)}")


# ---------------------------------------------------------------------------
# export entry points
# ---------------------------------------------------------------------------

def export_state_dict(model, params):
    """Our params tree -> reference-named torch ``state_dict``
    ({name: torch.FloatTensor}).  Raises if any mapped path is missing from
    ``params`` — a silent partial export would defeat the compatibility
    contract."""
    import torch
    from qaig_tpu.utils.checkpoint import flatten_tree

    flat = flatten_tree(params)
    sd = {}
    for ours, theirs, kind in mapping_for_model(model):
        if ours not in flat:
            raise KeyError(f"export: param path {ours!r} missing "
                           f"(wanted for torch key {theirs!r})")
        sd[theirs] = torch.from_numpy(to_torch_layout(flat[ours], kind))
    return sd


def export_checkpoint(model, ckpt, out_path, logging=print,
                      opt_state=None, learning_rate=None):
    """Write a reference-loadable ``.pt`` checkpoint: the input checkpoint
    dict's schema (hyperparams etc.) with ``model`` replaced by the torch
    state_dict and ``model_optimizer`` by a torch-Adam state dict when
    ``opt_state`` (an optax Adam state for the same params) is given.

    The reference reads these via ``torch.load`` + tolerant
    ``custom_load_state_dict`` (``utils/model_utils.py:36-52``); we emit
    exact names/layouts so nothing is skipped."""
    import torch

    out = {}
    for key, value in ckpt.items():
        if key in ("model", "checkpoint", "model_optimizer"):
            continue
        out[key] = value
    state_key = "checkpoint" if "checkpoint" in ckpt else "model"
    out[state_key] = export_state_dict(model, ckpt_params_tree(ckpt))
    if opt_state is not None:
        from qaig_tpu.utils.torch_optim import export_adam_state
        out["model_optimizer"] = export_adam_state(
            model, opt_state, learning_rate=learning_rate)
    elif "model_optimizer" in ckpt:
        from qaig_tpu.utils.torch_optim import is_torch_adam_state
        prev = ckpt["model_optimizer"]
        if is_torch_adam_state(prev):
            # already torch-format (round-tripped import) — re-tensorize
            prev = dict(prev, state={
                k: {kk: torch.as_tensor(vv) for kk, vv in v.items()}
                for k, v in prev["state"].items()})
            out["model_optimizer"] = prev
        else:
            out["model_optimizer"] = None
    tmp = str(out_path) + ".tmp"
    torch.save(out, tmp)
    import os
    os.replace(tmp, str(out_path))
    logging(f"Exported reference-format checkpoint: {out_path}")
    return True


def ckpt_params_tree(ckpt):
    """The params entry of a native checkpoint dict (AE/transformer use
    'model', the codebook uses 'checkpoint')."""
    return ckpt["checkpoint"] if "checkpoint" in ckpt else ckpt["model"]
