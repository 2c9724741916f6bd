"""Generate images through the transformer cascade (CLI parity with the
reference ``generate_images.py``)."""

import argparse
import pathlib

from qaig_tpu.cli._args import add_runtime_args

from qaig_tpu.infer import generate


def main():
    parser = argparse.ArgumentParser(description="Generate Images.")
    parser.add_argument("--device", choices=["auto", "cpu", "tpu", "cuda"],
                        type=str, default="auto")
    parser.add_argument("--decoder-path", required=True, type=pathlib.Path)
    parser.add_argument("--num-images", type=int, default=25)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--config-path", required=True, type=pathlib.Path)
    parser.add_argument("--bf16", action="store_true",
                        help="Serving precision: run the cascade in bfloat16 "
                             "(fp32 reference numerics stay the default).")
    parser.add_argument("--use-ema", action="store_true",
                        help="Generate with the EMA weights (model_ema, "
                             "written by training under --ema-decay; falls "
                             "back to live weights with a log line).")
    parser.add_argument("--profile-dir", default=None, type=pathlib.Path,
                        help="Capture a jax.profiler trace of the cascade "
                             "generation here.")
    fused = parser.add_mutually_exclusive_group()
    fused.add_argument("--fused", dest="fused", action="store_true",
                       default=None,
                       help="Force the fused single-dispatch cascade (one "
                            "device program for all stages + decode; the "
                            "batch-1 interactive-latency path, default "
                            "whenever generation is unsharded).")
    fused.add_argument("--no-fused", dest="fused", action="store_false",
                       help="Force the per-segment dispatched loop.")
    parser.add_argument("--num-model-shards", type=int, default=1,
                        help="Tensor-parallel shards for each stage "
                             "transformer's weights (Megatron MLP "
                             "sharding over the mesh's model axis; for "
                             "models too large for one chip).")
    add_runtime_args(parser)
    parser.add_argument("--out-dir", required=True, type=pathlib.Path)
    args = vars(parser.parse_args())
    generate.run(args)


if __name__ == "__main__":
    main()
