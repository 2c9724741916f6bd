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

from qaig_tpu.cli.export_torch import main, run, model_from_checkpoint  # noqa: F401


if __name__ == "__main__":
    main()
