#!/usr/bin/env python
"""bf16-vs-fp32 transformer-training quality A/B on a finished quality run.

The quality ledger (QUALITY.md) trains the pipeline in reference numerics
(fp32).  This probe reuses a finished ``quality_run.py`` output directory
(its cached feature maps + trained codebooks) to train the BASE transformer
twice from the same seed — once fp32, once ``--bf16`` mixed precision
(bfloat16 compute, fp32 master weights/Adam; the flagship training
precision, +57% step throughput per docs/PERFORMANCE.md) — and prints both
CE curves so the ledger can show the flagship precision *learns the same*.

    python scripts/quality_bf16_ab.py --qrun-dir /tmp/qrun --steps 1500
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def ce_curve(out_dir, every):
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from quality_run import loss_curve
    return loss_curve(out_dir, "ce_loss", every=every)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--qrun-dir", required=True, type=pathlib.Path,
                        help="a finished quality_run.py --out-dir")
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--device", default="auto")
    parser.add_argument("--compilation-cache-dir", default=None)
    args = parser.parse_args()

    from qaig_tpu.train import common
    common.select_platform(args.device)
    from qaig_tpu.train import transformer as tf_stage
    from quality_run import checkpoints

    q = args.qrun_dir
    report = json.loads((q / "quality.json").read_text())
    fmap_manifest = str(q / "fmaps" / "all_dataset.json")
    ae_ckpt = report["stages"]["autoencoder"]["checkpoint"]
    # the base stage maps the two COARSEST codebooks (insertion order in
    # the report matches quality_run's training order)
    cb_keys = [k for k in report["stages"] if k.startswith("codebook_")]

    def cb_path(key):
        """The codebook the ledger's transformers actually consumed: the
        pruned one when the run included the prune stage."""
        st = report["stages"][key]
        return (st.get("prune") or {}).get("checkpoint", st["checkpoint"])

    cb0 = cb_path(cb_keys[0])
    cb1 = cb_path(cb_keys[1])
    cfg = q / "tf_base.json"  # same config the ledger's base stage used

    out = {"steps": args.steps, "batch": args.batch, "seed": args.seed}
    for tag, bf16 in (("fp32", False), ("bf16", True)):
        run_dir = q / f"tf_base_ab_{tag}"
        t0 = time.time()
        tf_stage.run({
            "device": args.device, "seed": args.seed,
            "compilation_cache_dir": args.compilation_cache_dir,
            "dataset_path": fmap_manifest, "train_base_model": True,
            "decoder_path": ae_ckpt, "lr_codebook_path": cb0,
            "hr_codebook_path": cb1, "config_path": cfg,
            "out_dir": run_dir, "batch_size": args.batch,
            "test_num_sample": 5, "checkpoint_step": args.steps,
            "lr_step": 10 * args.steps, "max_epoch": 10 ** 9,
            "max_steps": args.steps, "temperature": 1.0, "bf16": bf16,
            "use_activation_checkpoint": True})
        curve = ce_curve(run_dir, every=max(1, args.steps // 10))
        out[tag] = {"ce_curve": curve,
                    "final_ce": curve[-1][1] if curve else None,
                    "wall_s": round(time.time() - t0, 1),
                    "checkpoint": str(checkpoints(run_dir)[-1])}
    if out["fp32"]["final_ce"] and out["bf16"]["final_ce"]:
        out["final_ce_delta"] = round(
            out["bf16"]["final_ce"] - out["fp32"]["final_ce"], 4)
    (q / "bf16_ab.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
