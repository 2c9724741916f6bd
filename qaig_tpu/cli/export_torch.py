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


def _adam_from_orbax_flat(flat):
    """Rebuild an Adam-state node from an ``.orbax`` checkpoint's flat
    dotted-path ``model_optimizer`` dict.  ``flatten_tree`` flattens the
    optax namedtuples POSITIONALLY, so ``ScaleByAdamState(count, mu, nu)``
    restores as ``{"<p>.0": count, "<p>.1.<param>": mu, "<p>.2.<param>":
    nu}`` for some tuple-prefix ``<p>``.  Returns None when the dict holds
    no such node (e.g. a torch-format round-trip)."""
    import numpy as np
    from collections import namedtuple

    # candidate prefixes: keys holding a scalar at tuple position 0
    prefixes = []
    for key, value in flat.items():
        if (key == "0" or key.endswith(".0")) and np.ndim(value) == 0:
            prefixes.append(key[:-2] if key.endswith(".0") else "")
    for p in sorted(prefixes, key=len):
        mu_p = (p + ".1." if p else "1.")
        nu_p = (p + ".2." if p else "2.")
        mu = {k[len(mu_p):]: v for k, v in flat.items()
              if k.startswith(mu_p)}
        nu = {k[len(nu_p):]: v for k, v in flat.items()
              if k.startswith(nu_p)}
        if mu and sorted(mu) == sorted(nu):
            node = namedtuple("AdamState", ["count", "mu", "nu"])
            return node(flat[p + ".0" if p else "0"], mu, nu)
    return None


def run(args):
    status, ckpt = load_model(str(args["model_path"]))
    if not status:
        raise RuntimeError("An error occured while loading model checkpoint!")
    model, params = model_from_checkpoint(ckpt)

    opt_state = None
    if not args.get("no_optim") and ckpt.get("model_optimizer") is not None:
        opt_state = ckpt["model_optimizer"]
        if isinstance(opt_state, dict):
            # orbax backend: the optimizer came back as a flat dotted-path
            # dict (or a torch-format dict from a round-trip, which
            # export_checkpoint re-tensorizes itself) — don't drop it
            # silently.
            from qaig_tpu.utils.torch_optim import is_torch_adam_state
            if is_torch_adam_state(opt_state):
                opt_state = None  # export_checkpoint handles this case
            else:
                opt_state = _adam_from_orbax_flat(opt_state)
                if opt_state is None and not args.get("no_optim"):
                    print("Warning: checkpoint's model_optimizer has no "
                          "recognizable Adam state; exporting without it.")

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
