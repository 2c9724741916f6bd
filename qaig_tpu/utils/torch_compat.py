"""Reference (PyTorch) checkpoint import.

Converts reference torch ``state_dict``s (flat name->tensor, e.g. the
pretrained weights published for the reference implementation) into this
framework's param trees.  Layout conversions:

* Linear ``(out, in)`` -> dense kernel ``(in, out)``,
* Conv2d ``OIHW`` -> ``HWIO``,
* ConvTranspose2d ``(in, out, kH, kW)`` -> spatially-flipped ``HWIO`` (our
  transposed conv is stored correlation-ready, see
  ``qaig_tpu.models.core.conv_transpose2d``),
* LayerNorm ``weight/bias`` -> ``g``/``b``; Embedding ``weight`` -> ``w``.

Name contracts follow the reference module structure (e.g.
``fc_encoder_layer.{i}.conv_layer.0.weight``, ``...self_attn.q_block.0.
linear_layer.0.weight``); conversion is tolerant — missing/mismatched
entries are skipped exactly like the reference's ``custom_load_state_dict``
(``models/Autoencoder.py:45-61``), which is what enables architecture
surgery and encoder-only loads from autoencoder checkpoints.
"""

import numpy as np

from qaig_tpu.utils.checkpoint import tolerant_restore


def _linear(sd, prefix):
    w = sd.get(f"{prefix}.weight")
    b = sd.get(f"{prefix}.bias")
    out = {}
    if w is not None:
        out["w"] = np.ascontiguousarray(np.asarray(w).T)
    if b is not None:
        out["b"] = np.asarray(b)
    return out


def _conv(sd, prefix):
    w = sd.get(f"{prefix}.weight")
    b = sd.get(f"{prefix}.bias")
    out = {}
    if w is not None:
        out["w"] = np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))
    if b is not None:
        out["b"] = np.asarray(b)
    return out


def _conv_transpose(sd, prefix):
    w = sd.get(f"{prefix}.weight")
    b = sd.get(f"{prefix}.bias")
    out = {}
    if w is not None:
        w = np.asarray(w)[:, :, ::-1, ::-1]
        out["w"] = np.ascontiguousarray(w.transpose(2, 3, 0, 1))
    if b is not None:
        out["b"] = np.asarray(b)
    return out


def _emit(flat, path, leaf_dict):
    for k, v in leaf_dict.items():
        flat[f"{path}.{k}"] = v


def strip_prefix(sd, prefix):
    """Return entries under ``prefix`` with it removed (tolerates both the
    prefixed autoencoder form and the bare form)."""
    out = {}
    for name, value in sd.items():
        if name.startswith(prefix):
            out[name[len(prefix):]] = value
        else:
            out[name] = value
    return out


# ---------------------------------------------------------------------------
# conv nets
# ---------------------------------------------------------------------------

def fc_encoder_flat(sd, num_torch_layers):
    """Reference ``fc_encoder_layer.{i}.conv_layer.0`` convs -> our
    ``layers.{i}`` list (same ordering; all plain convs)."""
    sd = strip_prefix(sd, "fc_encoder.")
    flat = {}
    for i in range(num_torch_layers):
        _emit(flat, f"layers.{i}",
              _conv(sd, f"fc_encoder_layer.{i}.conv_layer.0"))
    return flat


def fc_decoder_flat(sd, specs):
    """Reference decoder: ``fc_decoder_layer.0`` is a 2-conv Sequential stem,
    then one module per spec; our flat list merges the stem."""
    sd = strip_prefix(sd, "fc_decoder.")
    flat = {}
    for j, (_, _, kind) in enumerate(specs):
        if j == 0:
            tname = "fc_decoder_layer.0.0.conv_layer.0"
        elif j == 1:
            tname = "fc_decoder_layer.0.1.conv_layer.0"
        else:
            tname = f"fc_decoder_layer.{j - 1}.conv_layer.0"
        conv = _conv_transpose(sd, tname) if kind == "up" else _conv(sd, tname)
        _emit(flat, f"layers.{j}", conv)
    return flat


def autoencoder_flat(sd, enc_specs, dec_specs):
    flat = {}
    enc = fc_encoder_flat(strip_prefix(sd, "fc_encoder."), len(enc_specs))
    dec = fc_decoder_flat(strip_prefix(sd, "fc_decoder."), dec_specs)
    for k, v in enc.items():
        flat[f"fc_encoder.{k}"] = v
    for k, v in dec.items():
        flat[f"fc_decoder.{k}"] = v
    return flat


# ---------------------------------------------------------------------------
# codebook
# ---------------------------------------------------------------------------

def codebook_flat(sd):
    flat = {}
    w = sd.get("codebook.weight")
    if w is not None:
        flat["codebook"] = np.asarray(w)
    return flat


# ---------------------------------------------------------------------------
# transformer
# ---------------------------------------------------------------------------

def _mlp2_flat(flat, path, sd, tprefix):
    _emit(flat, f"{path}.l0", _linear(sd, f"{tprefix}.0.linear_layer.0"))
    _emit(flat, f"{path}.l1", _linear(sd, f"{tprefix}.1.linear_layer.0"))


def _norm_flat(flat, path, sd, tprefix, use_adaln):
    if use_adaln:
        _emit(flat, f"{path}.scale",
              _linear(sd, f"{tprefix}.scale_layer.scale"))
        _emit(flat, f"{path}.shift",
              _linear(sd, f"{tprefix}.shift_layer.shift"))
    else:
        g = sd.get(f"{tprefix}.weight")
        b = sd.get(f"{tprefix}.bias")
        if g is not None:
            flat[f"{path}.g"] = np.asarray(g)
        if b is not None:
            flat[f"{path}.b"] = np.asarray(b)


def _res_flat(flat, path, sd, tprefix, use_scale):
    _emit(flat, f"{path}.linear",
          _linear(sd, f"{tprefix}.linear.linear_layer.0"))
    if use_scale:
        _emit(flat, f"{path}.scale",
              _linear(sd, f"{tprefix}.scale_layer.scale"))


def _attn_flat(flat, path, sd, tprefix):
    for ours, theirs in (("q", "q_block"), ("k", "k_block"), ("v", "v_block")):
        _mlp2_flat(flat, f"{path}.{ours}", sd, f"{tprefix}.{theirs}")


def _block_flat(flat, path, sd, tprefix, use_cross, use_adaln, use_scale):
    _norm_flat(flat, f"{path}.self_attn.norm", sd,
               f"{tprefix}.self_attn_block.self_attn_norm", use_adaln)
    _attn_flat(flat, f"{path}.self_attn.attn", sd,
               f"{tprefix}.self_attn_block.self_attn")
    _res_flat(flat, f"{path}.self_attn.res", sd,
              f"{tprefix}.self_attn_block.self_attn_res", use_scale)
    if use_cross:
        _norm_flat(flat, f"{path}.cross_attn.norm", sd,
                   f"{tprefix}.cross_attn_block.cross_attn_norm", use_adaln)
        _attn_flat(flat, f"{path}.cross_attn.attn", sd,
                   f"{tprefix}.cross_attn_block.cross_attn")
        _res_flat(flat, f"{path}.cross_attn.res", sd,
                  f"{tprefix}.cross_attn_block.cross_attn_res", use_scale)
    _norm_flat(flat, f"{path}.ffn.norm", sd,
               f"{tprefix}.feedforward_block.feedforward_norm", use_adaln)
    _mlp2_flat(flat, f"{path}.ffn.ff", sd,
               f"{tprefix}.feedforward_block.feedforward")
    _res_flat(flat, f"{path}.ffn.res", sd,
              f"{tprefix}.feedforward_block.feedforward_res", use_scale)


def transformer_flat(sd, cfg):
    """``cfg`` is a :class:`qaig_tpu.models.transformer.TransformerConfig`."""
    flat = {}
    if cfg.use_encoder:
        w = sd.get("enc_embedding.weight")
        if w is not None:
            flat["enc_embedding.w"] = np.asarray(w)
        for i in range(cfg.num_enc_layers):
            _block_flat(flat, f"encoder_layers.{i}", sd,
                        f"encoder_layers.{i}", use_cross=False,
                        use_adaln=False, use_scale=False)
    w = sd.get("dec_embedding.weight")
    if w is not None:
        flat["dec_embedding.w"] = np.asarray(w)
    for i in range(cfg.num_dec_layers):
        _block_flat(flat, f"decoder_layers.{i}", sd,
                    f"decoder_layers.{i}", use_cross=cfg.use_encoder,
                    use_adaln=cfg.use_pos_cond, use_scale=cfg.use_pos_cond)
    if cfg.use_pos_cond:
        _mlp2_flat(flat, "pos_cond_layer", sd, "pos_cond_layer")
    _mlp2_flat(flat, "classifier", sd, "classifier")
    return flat


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------

def load_torch_into(model, params, torch_state_dict, logging=print,
                    ignore_msgs=True):
    """Restore a reference state_dict into ``params`` for a given model
    object (FCEncoder / FCDecoder / Autoencoder / Codebook / Transformer)."""
    from qaig_tpu.models.conv_nets import FCEncoder, FCDecoder, Autoencoder
    from qaig_tpu.models.codebook import Codebook
    from qaig_tpu.models.transformer import Transformer

    sd = {k: np.asarray(v) for k, v in torch_state_dict.items()}
    if isinstance(model, Autoencoder):
        flat = autoencoder_flat(sd, model.encoder.specs, model.decoder.specs)
    elif isinstance(model, FCEncoder):
        flat = fc_encoder_flat(sd, len(model.specs))
    elif isinstance(model, FCDecoder):
        flat = fc_decoder_flat(sd, model.specs)
    elif isinstance(model, Codebook):
        flat = codebook_flat(sd)
    elif isinstance(model, Transformer):
        flat = transformer_flat(sd, model.cfg)
    else:
        raise TypeError(f"Unsupported model type: {type(model)}")
    return tolerant_restore(params, flat, logging=logging,
                            ignore_msgs=ignore_msgs)
