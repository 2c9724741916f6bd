"""Mechanical CLI flag parity against the reference's argparse surface.

MIGRATION.md claims every reference flag exists here with the same name,
type, default, and required-ness.  This test verifies that claim by
CAPTURING both sides' parsers (``parse_args`` is patched to raise before
anything runs) and diffing the option tables — so flag drift in either
direction fails loudly instead of silently invalidating the migration doc.

Reference parser definitions: ``train_autoencoder.py:26-81``,
``generate_fmap_dataset.py:76-123``, ``train_codebook.py:22-101``,
``prune_codebook.py:21-70``, ``train_quantized_transformer.py:41-129``,
``generate_images.py:19-55`` (all under ``/root/reference``).
"""

import argparse
import importlib
import importlib.util
import sys
import types
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference checkout not available")
pytest.importorskip("torch")

if str(REFERENCE) not in sys.path:
    sys.path.insert(0, str(REFERENCE))

# (reference script, our CLI module)
SCRIPTS = [
    ("train_autoencoder.py", "qaig_tpu.cli.train_autoencoder"),
    ("generate_fmap_dataset.py", "qaig_tpu.cli.generate_fmap_dataset"),
    ("train_codebook.py", "qaig_tpu.cli.train_codebook"),
    ("prune_codebook.py", "qaig_tpu.cli.prune_codebook"),
    ("train_quantized_transformer.py",
     "qaig_tpu.cli.train_quantized_transformer"),
    ("generate_images.py", "qaig_tpu.cli.generate_images"),
]

# Deliberate, documented divergences (docs/MIGRATION.md "CLI parity"):
#   --device: the reference only knows cpu/cuda; here auto/cpu/tpu/cuda with
#   default "auto" so reference command lines run unchanged on a TPU host.
DEVICE_EXEMPT = {"choices", "default"}


class _Captured(Exception):
    def __init__(self, parser):
        self.parser = parser


def _stub_torchvision():
    # torchvision/tinydb are not in this image; the reference imports them
    # only inside save_images / the dataset loaders.  Flag definitions are
    # unaffected — the parsers are built before any of that runs.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_utils = types.ModuleType("torchvision.utils")
        tv_utils.make_grid = lambda images, **kw: images[0]
        tv_utils.save_image = lambda img, path: None
        tv.utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv_utils
    if "tinydb" not in sys.modules:
        td = types.ModuleType("tinydb")
        td.TinyDB = type("TinyDB", (), {})
        sys.modules["tinydb"] = td


def _capture_parser(main, monkeypatch):
    """Run ``main()`` far enough to build its parser, then bail out."""
    def grab(self, *a, **k):
        raise _Captured(self)
    monkeypatch.setattr(argparse.ArgumentParser, "parse_args", grab)
    with pytest.raises(_Captured) as exc:
        main()
    return exc.value.parser


def _reference_main(script):
    _stub_torchvision()
    spec = importlib.util.spec_from_file_location(
        "ref_flagparity_" + script.replace(".py", ""), REFERENCE / script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main


def _option_table(parser):
    table = {}
    for action in parser._actions:
        if isinstance(action, argparse._HelpAction):
            continue
        for opt in action.option_strings:
            table[opt] = action
    return table


def _describe(action):
    return {
        "type": getattr(action.type, "__name__", None)
        if action.type is not None else None,
        "default": action.default,
        "required": action.required,
        "nargs": action.nargs,
        "choices": None if action.choices is None else list(action.choices),
        "action": type(action).__name__,
    }


@pytest.mark.parametrize("ref_script,our_module",
                         SCRIPTS, ids=[s for s, _ in SCRIPTS])
def test_every_reference_flag_matches(ref_script, our_module, monkeypatch):
    ref_parser = _capture_parser(_reference_main(ref_script), monkeypatch)
    ours_parser = _capture_parser(
        importlib.import_module(our_module).main, monkeypatch)

    ref_table = _option_table(ref_parser)
    our_table = _option_table(ours_parser)

    missing = sorted(set(ref_table) - set(our_table))
    assert not missing, (
        f"{ref_script}: reference flags absent here: {missing}")

    mismatches = []
    for opt, ref_action in sorted(ref_table.items()):
        ref_desc = _describe(ref_action)
        our_desc = _describe(our_table[opt])
        exempt = DEVICE_EXEMPT if opt == "--device" else set()
        for field in ref_desc:
            if field in exempt:
                continue
            if ref_desc[field] != our_desc[field]:
                mismatches.append(
                    f"{ref_script} {opt}.{field}: "
                    f"reference={ref_desc[field]!r} ours={our_desc[field]!r}")
    assert not mismatches, "\n".join(mismatches)
