"""Fully-convolutional encoder / decoder / autoencoder.

Capability parity with reference ``models/FC_Encoder.py``, ``models/
FC_Decoder.py`` and ``models/Autoencoder.py`` (exact channel progressions and
activation placement), rebuilt TPU-first: NHWC conv compute on the MXU with an
NCHW public contract (the on-disk ``.npy`` feature-map cache and the codebook
patchify order are NCHW).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from qaig_tpu.models import core
from qaig_tpu.ops.activations import get_activation


@dataclass(frozen=True)
class ConvNetConfig:
    """Shared hyperparameters of the FC encoder/decoder pair (reference
    ``models/FC_Encoder.py:13-22`` ctor signature)."""
    num_layers: int = 2
    image_channel: int = 3
    min_channel: int = 128
    max_channel: int = 512
    latent_channel: int = 2
    hidden_activation_type: str = "silu"
    use_final_activation: bool = True
    final_activation_type: str = "tanh"


def _encoder_channels(cfg: ConvNetConfig):
    """(in, out, kind) triples; kind in {conv, down}.  Mirrors the channel
    walk of ``FC_Encoder.__init__`` (reference ``models/FC_Encoder.py:25-60``:
    stem -> [same-ch conv + 2x-downsample] * num_layers -> latent head)."""
    specs = [(cfg.image_channel, cfg.min_channel, "conv")]
    curr = cfg.min_channel
    for _ in range(cfg.num_layers):
        specs.append((curr, curr, "conv"))
        nxt = curr * 2 if curr * 2 < cfg.max_channel else cfg.max_channel
        specs.append((curr, nxt, "down"))
        curr = nxt
    specs.append((curr, cfg.latent_channel, "head"))
    return specs


def _decoder_channels(cfg: ConvNetConfig):
    """Mirrors ``FC_Decoder.__init__`` (reference ``models/FC_Decoder.py:
    27-66``: 2-conv stem -> [conv + 2x-upsample] * num_layers -> image
    head)."""
    specs = [
        (cfg.latent_channel, cfg.max_channel, "conv"),
        (cfg.max_channel, cfg.max_channel, "conv"),
    ]
    curr = cfg.max_channel
    for _ in range(cfg.num_layers):
        specs.append((curr, curr, "conv"))
        nxt = curr // 2 if curr // 2 > cfg.min_channel else cfg.min_channel
        specs.append((curr, nxt, "up"))
        curr = nxt
    specs.append((curr, cfg.image_channel, "head"))
    return specs


class _ConvStack:
    """Sequential conv stack driven by (in, out, kind) specs."""

    def __init__(self, cfg: ConvNetConfig, specs):
        self.cfg = cfg
        self.specs = specs

    def init(self, rng):
        params = []
        for spec in self.specs:
            rng, layer_rng = jax.random.split(rng)
            in_ch, out_ch, kind = spec
            if kind == "up":
                params.append(core.init_conv_transpose(layer_rng, in_ch,
                                                       out_ch, 4))
            else:
                params.append(core.init_conv(layer_rng, in_ch, out_ch, 3))
        return {"layers": params}

    def apply_nhwc(self, params, x):
        cfg = self.cfg
        hidden_act = get_activation(cfg.hidden_activation_type)
        final_act = (get_activation(cfg.final_activation_type)
                     if cfg.use_final_activation else None)
        for p, (_, _, kind) in zip(params["layers"], self.specs):
            if kind == "conv":
                x = core.conv2d(p, x, stride=1, padding=1,
                                activation=hidden_act)
            elif kind == "down":
                x = core.conv2d(p, x, stride=2, padding=1,
                                activation=hidden_act)
            elif kind == "up":
                x = core.conv_transpose2d(p, x, stride=2, padding=1,
                                          kernel_size=4,
                                          activation=hidden_act)
            else:  # head
                x = core.conv2d(p, x, stride=1, padding=1,
                                activation=final_act)
        return x

    def apply(self, params, x):
        """NCHW in / NCHW out (compute runs NHWC)."""
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = self.apply_nhwc(params, x)
        return jnp.transpose(x, (0, 3, 1, 2))


class FCEncoder(_ConvStack):
    """image -> latent; spatial /2^num_layers."""

    def __init__(self, cfg: ConvNetConfig):
        super().__init__(cfg, _encoder_channels(cfg))


class FCDecoder(_ConvStack):
    """latent -> image; spatial *2^num_layers."""

    def __init__(self, cfg: ConvNetConfig):
        super().__init__(cfg, _decoder_channels(cfg))


@dataclass(frozen=True)
class AutoencoderConfig:
    num_layers: int = 2
    image_channel: int = 3
    min_channel: int = 128
    max_channel: int = 512
    latent_channel: int = 2
    hidden_activation_type: str = "silu"
    use_final_enc_activation: bool = True
    encoder_activation_type: str = "silu"
    use_final_dec_activation: bool = True
    decoder_activation_type: str = "tanh"

    def encoder_config(self):
        return ConvNetConfig(
            num_layers=self.num_layers,
            image_channel=self.image_channel,
            min_channel=self.min_channel,
            max_channel=self.max_channel,
            latent_channel=self.latent_channel,
            hidden_activation_type=self.hidden_activation_type,
            use_final_activation=self.use_final_enc_activation,
            final_activation_type=self.encoder_activation_type)

    def decoder_config(self):
        return ConvNetConfig(
            num_layers=self.num_layers,
            image_channel=self.image_channel,
            min_channel=self.min_channel,
            max_channel=self.max_channel,
            latent_channel=self.latent_channel,
            hidden_activation_type=self.hidden_activation_type,
            use_final_activation=self.use_final_dec_activation,
            final_activation_type=self.decoder_activation_type)


class Autoencoder:
    """Composite encoder+decoder (reference ``models/Autoencoder.py:11-74``)."""

    def __init__(self, cfg: AutoencoderConfig):
        self.cfg = cfg
        self.encoder = FCEncoder(cfg.encoder_config())
        self.decoder = FCDecoder(cfg.decoder_config())

    def init(self, rng):
        enc_rng, dec_rng = jax.random.split(rng)
        return {
            "fc_encoder": self.encoder.init(enc_rng),
            "fc_decoder": self.decoder.init(dec_rng),
        }

    def get_latent(self, params, x):
        return self.encoder.apply(params["fc_encoder"], x)

    def recon_image(self, params, z):
        return self.decoder.apply(params["fc_decoder"], z)

    def apply(self, params, x):
        """NCHW image -> NCHW reconstruction, single fused NHWC pipeline."""
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = self.encoder.apply_nhwc(params["fc_encoder"], h)
        h = self.decoder.apply_nhwc(params["fc_decoder"], h)
        return jnp.transpose(h, (0, 3, 1, 2))
