"""Train the quantized transformer (CLI parity with the reference
``train_quantized_transformer.py``)."""

import argparse
import pathlib

from qaig_tpu.cli._args import add_runtime_args


def restricted_float(x):
    try:
        x = float(x)
    except ValueError:
        raise argparse.ArgumentTypeError(
            "%r not a floating-point literal" % (x,))
    if x < 0.1:
        raise argparse.ArgumentTypeError("%r not in range > 0.1" % (x,))
    return x


def main():
    from qaig_tpu.train import transformer

    parser = argparse.ArgumentParser(
        description="Train Quantized Transformer models.")
    parser.add_argument("--device", choices=["auto", "cpu", "tpu", "cuda"],
                        type=str, default="auto")
    parser.add_argument("--dataset-path", required=True, type=pathlib.Path)
    parser.add_argument("--train-base-model", action="store_true",
                        help="Train Base Model, Decoder-only.")
    parser.add_argument("--decoder-path", required=True, type=pathlib.Path)
    parser.add_argument("--lr-codebook-path", required=True,
                        type=pathlib.Path)
    parser.add_argument("--hr-codebook-path", required=True,
                        type=pathlib.Path)
    parser.add_argument("--model-path", default=None, type=pathlib.Path)
    parser.add_argument("--test-num-sample", type=int, default=25)
    parser.add_argument("--load-optim", action="store_true")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--temperature", type=restricted_float, default=1.0)
    parser.add_argument("--checkpoint-step", type=int, default=1_000)
    parser.add_argument("--lr-step", type=int, default=50_000)
    parser.add_argument("--max-epoch", type=int, default=1_000)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--use-activation-checkpoint", action="store_true")
    parser.add_argument("--skip-preview", action="store_true",
                        help="Skip checkpoint-time AR image previews.")
    parser.add_argument("--bf16", action="store_true",
                        help="Mixed-precision training: bfloat16 compute, float32 "
                             "master weights/optimizer (TPU MXU-native).")
    parser.add_argument("--debug-nans", action="store_true",
                        help="Enable jax_debug_nans (fail at the faulty op).")
    parser.add_argument("--profile-dir", default=None, type=pathlib.Path,
                        help="Capture a jax.profiler trace window here.")
    parser.add_argument("--profile-start", type=int, default=5)
    parser.add_argument("--profile-steps", type=int, default=5)
    parser.add_argument("--config-path", required=True, type=pathlib.Path)
    parser.add_argument("--log-every", type=int, default=1,
                        help="Sync loss to host every N steps (1 = reference behavior).")
    parser.add_argument("--num-model-shards", type=int, default=1,
                        help="Tensor-parallel shards over the mesh's model "
                             "axis (1 = pure data parallel).")
    parser.add_argument("--num-pipeline-stages", type=int, default=1,
                        help="Pipeline-parallel stages over the mesh's "
                             "pipe axis: decoder layers are partitioned "
                             "per stage and microbatches flow through a "
                             "GPipe schedule (1 = off; composes with "
                             "--num-model-shards on a data x pipe x model "
                             "mesh).")
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="Accumulate gradients over N equal chunks of "
                             "the batch before one Adam update (activation "
                             "memory scales with batch/N; updates match "
                             "the full-batch step). Not combinable with "
                             "--num-pipeline-stages.")
    parser.add_argument("--zero-opt", action="store_true",
                        help="ZeRO-1: shard Adam moments over the data "
                             "axis (each chip stores/updates 1/data of "
                             "the optimizer state; grads reduce-scatter, "
                             "params all-gather). Not combinable with "
                             "--num-pipeline-stages.")
    parser.add_argument("--num-microbatches", type=int, default=None,
                        help="Microbatches per step under "
                             "--num-pipeline-stages (default = the stage "
                             "count; more microbatches shrink the pipeline "
                             "bubble).")
    parser.add_argument("--auto-resume", action="store_true",
                        help="Fault recovery: continue from the newest "
                             "checkpoint in --out-dir (model + optimizer + "
                             "EMA + step counter); starts fresh when none "
                             "exists. Explicit --model-path wins.")
    parser.add_argument("--ema-decay", type=float, default=None,
                        help="Maintain an exponential-moving-average copy "
                             "of the weights (decay per step, e.g. 0.999); "
                             "saved as model_ema in every checkpoint and "
                             "served via generate_images.py --use-ema.")
    parser.add_argument("--grad-clip", type=float, default=None,
                        help="Clip the gradient's global norm to this value "
                             "before each Adam update (e.g. 1.0).  "
                             "Beyond-reference stability: prevents the "
                             "late-training loss spikes the reference can "
                             "only detect (its NaN raise).")
    parser.add_argument("--keep-checkpoints", type=int, default=None,
                        help="Retention: keep only the N newest checkpoints "
                             "in --out-dir, pruning older ones after each "
                             "successful save (default: keep all, like the "
                             "reference).")
    parser.add_argument("--checkpoint-backend",
                        choices=["pickle", "orbax", "orbax-async"],
                        default="pickle",
                        help="pickle = reference-compatible single file; "
                             "orbax = sharded directory (no host gather); "
                             "orbax-async = sharded + the disk commit "
                             "overlaps training.")
    add_runtime_args(parser)
    parser.add_argument("--out-dir", required=True, type=pathlib.Path)
    args = vars(parser.parse_args())
    transformer.run(args)


if __name__ == "__main__":
    main()
