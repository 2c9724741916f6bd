from qaig_tpu.infer.decode import DecodeEngine, SamplerSettings

__all__ = ["DecodeEngine", "SamplerSettings", "CascadePipeline"]


def __getattr__(name):
    if name == "CascadePipeline":
        from qaig_tpu.infer.pipeline import CascadePipeline
        return CascadePipeline
    raise AttributeError(name)
