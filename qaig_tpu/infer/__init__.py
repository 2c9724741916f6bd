from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings

__all__ = ["DecodeEngine", "SamplerSettings"]
