#!/usr/bin/env python
"""Export a native checkpoint as a reference-loadable torch ``.pt`` file.

The inverse of the torch-import path: the output keeps the checkpoint's
self-describing hyperparameter schema, with ``model`` converted to a
reference-named/-layout torch ``state_dict`` (loads through the reference's
``utils/model_utils.py:36-52`` + ``custom_load_state_dict`` with zero
skipped keys) and ``model_optimizer`` to a torch-Adam state dict when
present (so ``--load-optim`` resume works under the reference too).

Usage:
    python export_torch.py --model-path out/models_checkpoint/model_100.pt \
        --out-path /tmp/reference_model.pt
"""

import argparse
import pathlib

from qaig_tpu.train import common
from qaig_tpu.utils import load_model
from qaig_tpu.utils.torch_export import export_checkpoint


def model_from_checkpoint(ckpt, logging=print):
    """(model, params) for any of the three checkpoint schemas
    (transformer / codebook / autoencoder), inferred from the dict keys."""
    if "train_base_model" in ckpt:
        from qaig_tpu.infer.generate import transformer_from_checkpoint
        model, params, _ = transformer_from_checkpoint(ckpt, logging=logging)
        return model, params
    if "checkpoint" in ckpt:
        model, params = common.codebook_from_checkpoint(ckpt,
                                                        logging=logging)
        return model, params
    model, params, _ = common.autoencoder_from_checkpoint(ckpt,
                                                          logging=logging)
    return model, params


def run(args):
    status, ckpt = load_model(str(args["model_path"]))
    if not status:
        raise RuntimeError("An error occured while loading model checkpoint!")
    model, params = model_from_checkpoint(ckpt)

    opt_state = None
    if not args.get("no_optim") and ckpt.get("model_optimizer") is not None \
            and not isinstance(ckpt["model_optimizer"], dict):
        opt_state = ckpt["model_optimizer"]

    export_checkpoint(model, ckpt, args["out_path"], opt_state=opt_state,
                      learning_rate=args.get("lr"))


def main():
    parser = argparse.ArgumentParser(
        description="Export checkpoint to reference torch format.")
    parser.add_argument("--model-path", required=True, type=pathlib.Path,
                        help="Native (or .orbax) checkpoint to export.")
    parser.add_argument("--out-path", required=True, type=pathlib.Path,
                        help="Destination .pt file (torch.save format).")
    parser.add_argument("--no-optim", action="store_true",
                        help="Skip optimizer-state conversion.")
    parser.add_argument("--lr", type=float, default=None,
                        help="LR recorded in the exported param group "
                             "(the reference force-resets it from config).")
    args = vars(parser.parse_args())
    run(args)


if __name__ == "__main__":
    main()
