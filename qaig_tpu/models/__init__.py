from qaig_tpu.models.conv_nets import FCEncoder, FCDecoder, Autoencoder
from qaig_tpu.models.codebook import Codebook
from qaig_tpu.models.transformer import Transformer, TransformerConfig

__all__ = [
    "FCEncoder",
    "FCDecoder",
    "Autoencoder",
    "Codebook",
    "Transformer",
    "TransformerConfig",
]
